package graft.storage

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Path, Paths}
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}

/** Network remote transfer: the reference's pack/unpack HTTP protocol
  * ([ref:core/api/api_pack.pl], [ref:server/routes.pl] clone/fetch/
  * push routes) — two stores on different hosts sync by exchanging a
  * PACK (the layers + commit metadata + branch head of a chain
  * segment) over plain HTTP, with refs negotiation so only missing
  * layers travel.
  *
  * Wire format: one ZIP archive of the transfer directory that the
  * filesystem `pack`/`unpack` pair already exchange (`layers/<id>/...`
  * parquet plus `_catalog/{commits,refs}`) — content-addressed layer
  * ids make the transfer idempotent, and ZIP is pure-JDK so the
  * protocol needs no extra dependency on either end.
  *
  * Negotiation: the receiver advertises what it HAS (its commit ids —
  * DAG-sized, tiny even at 100 TB data); the sender packs only chain
  * layers outside that set. A fetch therefore moves |new commits|
  * layers, never the whole history, matching the reference's
  * incremental pack semantics.
  *
  * Scale note: pack payloads stream through the JVM heap as one byte
  * array per transfer. Layers are delta-sized, not corpus-sized — a
  * 100 TB dataset's COMMIT deltas are what travels, and a bulk initial
  * sync of a huge base layer should ship the parquet out-of-band (the
  * filesystem pack path, still supported) exactly as one would with
  * git over HTTP vs a seeded clone. */
object RemoteTransfer {

  // ---- pack <-> bytes -------------------------------------------------

  /** ZIP a directory tree to bytes (relative paths, deterministic
    * order, no compression-level tuning — parquet is already
    * compressed, so STORED-vs-DEFLATED is noise here). */
  def zipDir(dir: Path): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    val files = Files.walk(dir).filter(Files.isRegularFile(_))
      .sorted(java.util.Comparator.comparing((p: Path) => p.toString))
    files.forEach { p =>
      zos.putNextEntry(new ZipEntry(dir.relativize(p).toString))
      Files.copy(p, zos)
      zos.closeEntry()
    }
    zos.close()
    bos.toByteArray
  }

  /** Unzip bytes into a directory, refusing path traversal. */
  def unzipTo(bytes: Array[Byte], dir: Path): Unit = {
    val zis = new ZipInputStream(new java.io.ByteArrayInputStream(bytes))
    var e = zis.getNextEntry
    while (e != null) {
      val dest = dir.resolve(e.getName).normalize()
      require(dest.startsWith(dir), s"zip entry escapes pack dir: ${e.getName}")
      if (!e.isDirectory) {
        Files.createDirectories(dest.getParent)
        Files.copy(zis, dest,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
      zis.closeEntry()
      e = zis.getNextEntry
    }
    zis.close()
  }

  /** Pack `branch` (minus the `have` commit set) to ZIP bytes. */
  def packBytes(store: LayerStore, branch: String,
                have: Set[String] = Set.empty): Array[Byte] = {
    val tmp = Files.createTempDirectory("graft-packz")
    try {
      store.pack(branch, tmp.toString, have)
      zipDir(tmp)
    } finally deleteTree(tmp)
  }

  /** Import ZIP-packed layers into `store` (no ref moves); returns the
    * pack's (branch → head) map. */
  def unpackBytes(store: LayerStore, bytes: Array[Byte]): Map[String, String] = {
    val tmp = Files.createTempDirectory("graft-unpackz")
    try {
      unzipTo(bytes, tmp)
      store.unpack(tmp.toString)
    } finally deleteTree(tmp)
  }

  private def deleteTree(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => { val _ = Files.deleteIfExists(f) })

  // ---- HTTP remote client --------------------------------------------

  /** A graft server as a remote ([ref:server/routes.pl] remote URLs).
    * `base` is e.g. `http://host:6363`; `token` the bearer credential
    * the remote's auth surface expects. */
  final case class HttpRemote(base: String, token: Option[String] = None) {
    private val client = HttpClient.newHttpClient()

    private def request(path: String): HttpRequest.Builder = {
      val b = HttpRequest.newBuilder(URI.create(base + path))
      token.fold(b)(t => b.header("Authorization", s"Bearer $t"))
    }

    private def expectOk(r: HttpResponse[_]): Unit =
      require(r.statusCode() / 100 == 2,
        s"remote $base returned HTTP ${r.statusCode()}")

    /** The remote's branch → head map (`GET /api/refs`). */
    def refs: Map[String, String] = {
      val r = client.send(request("/api/refs").GET().build(),
        HttpResponse.BodyHandlers.ofString())
      expectOk(r)
      org.json4s.jackson.JsonMethods.parse(r.body()) \ "refs" match {
        case org.json4s.JObject(fields) => fields.collect {
          case (k, org.json4s.JString(v)) => k -> v }.toMap
        case _ => Map.empty
      }
    }

    /** Ask the remote to pack `branch`, excluding commits we `have`. */
    def fetchPack(branch: String, have: Iterable[String]): Array[Byte] = {
      val q = s"/api/pack?branch=${enc(branch)}" +
        (if (have.isEmpty) "" else s"&have=${enc(have.mkString(","))}")
      val r = client.send(
        request(q).POST(HttpRequest.BodyPublishers.noBody()).build(),
        HttpResponse.BodyHandlers.ofByteArray())
      expectOk(r)
      r.body()
    }

    /** Send a pack; `advance` asks the remote to fast-forward that
      * branch ref to the packed head (the push half). Returns the
      * pack's heads as the remote reports them. */
    def sendPack(bytes: Array[Byte], advance: Option[String] = None): Map[String, String] = {
      val q = "/api/unpack" + advance.map(b => s"?advance=${enc(b)}").getOrElse("")
      val r = client.send(
        request(q).POST(HttpRequest.BodyPublishers.ofByteArray(bytes)).build(),
        HttpResponse.BodyHandlers.ofString())
      require(r.statusCode() / 100 == 2,
        s"remote $base rejected pack: HTTP ${r.statusCode()} ${r.body().take(300)}")
      org.json4s.jackson.JsonMethods.parse(r.body()) \ "heads" match {
        case org.json4s.JObject(fields) => fields.collect {
          case (k, org.json4s.JString(v)) => k -> v }.toMap
        case _ => Map.empty
      }
    }

    private def enc(s: String) =
      java.net.URLEncoder.encode(s, "UTF-8")
  }

  // ---- protocol verbs over an HTTP remote ----------------------------

  /** Fetch: negotiate (send every local commit id as `have`), import
    * the missing layers, record `remotes/<name>/<branch>` — the local
    * branch head does not move. Returns the remote head. */
  def fetch(store: LayerStore, remote: HttpRemote, branch: String,
            name: String = "origin"): String = {
    val have = store.commitIds
    val heads = unpackBytes(store, remote.fetchPack(branch, have))
    val head = heads.getOrElse(branch,
      sys.error(s"remote pack carries no head for $branch"))
    store.reset(s"remotes/$name/$branch", head)
    head
  }

  /** Pull: fetch + fast-forward the local branch (refuses when the
    * local head is not an ancestor of the remote head). */
  def pull(store: LayerStore, remote: HttpRemote, branch: String): String = {
    val head = fetch(store, remote, branch)
    store.refs.get(branch).foreach { local =>
      require(store.chain(head).contains(local),
        s"non-fast-forward pull of $branch rejected (local $local diverged)")
    }
    store.reset(branch, head)
    head
  }

  /** Push: fast-forward the remote branch to the local head, sending
    * only the layers past the remote's current head. The remote
    * re-checks fast-forwardness itself before moving the ref. */
  def push(store: LayerStore, remote: HttpRemote, branch: String): String = {
    val localHead = store.refs.getOrElse(branch,
      sys.error(s"no such local branch $branch"))
    val localChain = store.chain(localHead)
    val have: Set[String] = remote.refs.get(branch) match {
      case Some(rh) =>
        val idx = localChain.indexOf(rh)
        require(idx >= 0, s"non-fast-forward push of $branch rejected " +
          s"(remote head $rh not in local history)")
        localChain.take(idx + 1).toSet
      case None => Set.empty
    }
    val heads = remote.sendPack(packBytes(store, branch, have), Some(branch))
    heads.getOrElse(branch, localHead)
  }

  /** Clone: fetch the remote branch into an (empty or fresh) store and
    * point the local branch ref at its head. */
  def cloneFrom(store: LayerStore, remote: HttpRemote, branch: String): String = {
    val head = fetch(store, remote, branch)
    store.reset(branch, head)
    head
  }
}

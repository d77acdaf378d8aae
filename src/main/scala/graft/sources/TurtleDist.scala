package graft.sources

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.storage.Eav

/** Distributed (splittable) Turtle ingest — the two-pass design the
  * single-driver [[Turtle.load]] cannot scale past one node
  * (reference: core/triple/turtle_utils.pl bulk load; the reader here
  * is the Turtle analogue of [[NTriples]]' split-parallel line path).
  *
  * Pass 1 (tiny): per input split, run the line classifier from each
  * of the three possible scanner start states (outside / inside a
  * `"""`- / `'''`-literal) and collect the per-split state-transition
  * vector plus the `@prefix`/`@base` directive lines — the only
  * cross-document parse state Turtle carries. The driver folds the
  * transition vectors in (file, offset) order to learn each split's
  * ACTUAL start state (the standard chunk-composition trick for
  * splittable reads of quote-spanning formats), so raw-newline long
  * literals are fully supported without giving up split parallelism.
  * Everything collected is O(splits + directives), never data.
  *
  * Pass 2 (distributed): classify every line statement-terminating or
  * continuing under its split's known start state, assign global
  * statement ids by a per-partition-count prefix sum, group each
  * statement's lines, and parse each assembled statement with the full
  * [[Turtle.parse]] grammar, the directive preamble prepended. Fresh
  * blank labels (`[ … ]`, collections) are salted with the statement
  * id so concurrent statements can't collide; explicit `_:label`
  * blanks keep their document scope.
  *
  * FAST PATH: when no statement spans lines (every significant line
  * terminates — the shape every graft dump and most machine-written
  * Turtle has), parsing runs straight inside `mapPartitions` with NO
  * shuffle at all; the grouping shuffle only happens for documents
  * that actually use `;`-continuations or raw-newline literals.
  *
  * Restrictions (strict-raised, never silent): a prefix label
  * redefined mid-document with a different IRI is rejected (the
  * preamble is applied globally); CRLF newlines inside long literals
  * canonicalize to LF (the line reader strips terminators). */
object TurtleDist {

  /** Scanner states: outside any long literal / inside `"""…"""` /
    * inside `'''…'''`. Values double as machine indexes in pass 1. */
  private[graft] final val StOut = 0
  private[graft] final val StDq3 = 1
  private[graft] final val StSq3 = 2

  private val directiveRe =
    "(?i)^[ \\t]*(@prefix|@base|prefix[ \\t]|base[ \\t]).*".r.pattern

  /** Stateless wrapper (start state = outside): kept for the fast path
    * and classifier unit tests. */
  private[graft] def classify(line: String): (Boolean, Boolean, Boolean) = {
    val (term, dir, sig, _) = classify(line, StOut)
    (term, dir, sig)
  }

  /** Quote-, IRIREF- and long-literal-aware one-pass line
    * classification starting in scanner state `state`:
    * (endsStatement, isDirective, isSignificant, endState).
    * `<…>` IRIREF spans are skipped opaquely, so `#` fragments
    * (`…XMLSchema#integer`) and apostrophes inside IRIs neither start
    * comments nor open strings (the r15 advisor's silent-collapse
    * finding). A long literal left open at end of line hands its
    * state to the next line; an unclosed SHORT literal still throws
    * (single-quoted strings cannot span lines in Turtle). */
  private[graft] def classify(line: String,
                              state: Int): (Boolean, Boolean, Boolean, Int) = {
    var i = 0; val n = line.length
    var last: Char = 0
    var sig = state != StOut // in-literal lines are content, even empty
    var st = state

    // index just past a closing triple quote scanning from `from`, or
    // -1 if the literal stays open through end of line. A run of k≥3
    // quotes closes the literal at the run's end (the leading k−3 are
    // content — Turtle grammar's ('"' | '""')? lookahead).
    def scanLong(q: Char, from: Int): Int = {
      var j = from
      while (j < n) {
        val c = line.charAt(j)
        if (c == '\\') j += 2
        else if (c == q) {
          var r = j
          while (r < n && line.charAt(r) == q) r += 1
          if (r - j >= 3) return r
          j = r
        } else j += 1
      }
      -1
    }

    while (i < n) {
      if (st != StOut) {
        val q = if (st == StDq3) '"' else '\''
        val end = scanLong(q, i)
        if (end < 0) { last = '"'; i = n }
        else { st = StOut; last = '"'; sig = true; i = end }
      } else {
        val ch = line.charAt(i)
        if (ch == '#') i = n // comment to end of line
        else if (ch == '<') {
          val close = line.indexOf('>', i + 1)
          if (close < 0) throw new IllegalArgumentException(
            "IRIREF open at end of line — not valid Turtle")
          last = '>'; sig = true; i = close + 1
        } else if (ch == '"' || ch == '\'') {
          val q = ch
          if (i + 2 < n && line.charAt(i + 1) == q && line.charAt(i + 2) == q) {
            val end = scanLong(q, i + 3)
            if (end < 0) { // raw-newline long literal opens here
              st = if (q == '"') StDq3 else StSq3
              last = '"'; sig = true; i = n
            } else { last = '"'; sig = true; i = end }
          } else {
            var j = i + 1; var closed = false
            while (j < n && !closed) {
              if (line.charAt(j) == '\\') j += 2
              else if (line.charAt(j) == q) closed = true
              else j += 1
            }
            if (!closed) throw new IllegalArgumentException(
              "string literal open at end of line — not line-safe Turtle; " +
                "use Turtle.load for this document")
            last = '"'; sig = true; i = j + 1
          }
        } else {
          if (!Character.isWhitespace(ch)) { last = ch; sig = true }
          i += 1
        }
      }
    }
    val isDir = state == StOut && sig && directiveRe.matcher(line).matches()
    (st == StOut && last == '.', isDir, sig, st)
  }

  /** Statement-salt packing: (fileIdx, byte offset) → one long. The
    * widths bound the supported corpus shape — refuse loudly past
    * them instead of silently colliding blank labels (r15 verdict). */
  private def packSid(fileIdx: Int, off: Long): Long = {
    require(off < (1L << 40) && fileIdx < (1 << 23),
      s"statement-salt packing overflow: file #$fileIdx at byte offset " +
        s"$off (limits: 2^23 files, 2^40 bytes per file) — repartition " +
        "the input into more, smaller files")
    (fileIdx.toLong << 40) | off
  }

  /** Parse one assembled statement under the collected preamble,
    * salting fresh blank labels with the statement id. */
  private def parseStatement(preamble: String, stmt: String,
                             sid: Long): Seq[Row] = {
    def salt(v: String): String =
      if (v != null && v.startsWith("_:gb")) s"_:g${sid}b${v.substring(4)}"
      else v
    Turtle.parse(preamble + "\n" + stmt).map { r =>
      val vs = r.toSeq.toArray
      vs(1) = salt(vs(1).asInstanceOf[String])
      if (vs(3) == "i") vs(4) = salt(vs(4).asInstanceOf[String])
      Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(vs))
    }
  }

  /** Distributed Turtle read of a text file/directory into EAV rows. */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    // Document order must be (file, byte offset) — NOT partition
    // order: Spark's file source bin-packs small files by SIZE, so
    // zipWithIndex over its partitions permutes lines of multi-file
    // inputs. The Hadoop text reader hands us the byte offset of every
    // line within its file for free; (fileIdx, offset) is a total
    // order that no packing or split placement can disturb.
    def hadoopRdd = spark.sparkContext.newAPIHadoopFile(
      path,
      classOf[org.apache.hadoop.mapreduce.lib.input.TextInputFormat],
      classOf[org.apache.hadoop.io.LongWritable],
      classOf[org.apache.hadoop.io.Text])
      .asInstanceOf[org.apache.spark.rdd.NewHadoopRDD[
        org.apache.hadoop.io.LongWritable, org.apache.hadoop.io.Text]]

    // pass 1, ONE job: one record per SPLIT — the three-machine
    // transition vector (end state per assumed start state), directive
    // lines and continuation counts per machine. Identical machine
    // states collapse to one classify call per line, so the triple
    // bookkeeping costs ~one scan on literal-free data.
    val stats = hadoopRdd.mapPartitionsWithInputSplit { (split, it) =>
      val fs = split
        .asInstanceOf[org.apache.hadoop.mapreduce.lib.input.FileSplit]
      val file = fs.getPath.toString
      val cur = Array(StOut, StDq3, StSq3)
      val dirs = Array.fill(3)(
        scala.collection.mutable.ArrayBuffer[(Long, String)]())
      val cont = Array.fill(3)(0L)
      // a machine whose ASSUMED start state makes a line malformed is
      // poisoned, not thrown: only the machine matching the split's
      // actual start state (driver-resolved below) decides validity —
      // and its error then raises as a clean driver-side message
      val dead: Array[String] = Array(null, null, null)
      it.foreach { case (off, txt) =>
        val l = txt.toString
        val memo = scala.collection.mutable
          .Map[Int, scala.util.Try[(Boolean, Boolean, Boolean, Int)]]()
        var k = 0
        while (k < 3) {
          if (dead(k) == null) {
            memo.getOrElseUpdate(cur(k),
              scala.util.Try(classify(l, cur(k)))) match {
              case scala.util.Success(r) =>
                if (r._2) dirs(k) += ((off.get(), l))
                else if (r._3 && !r._1) cont(k) += 1
                cur(k) = r._4
              case scala.util.Failure(e) => dead(k) = e.getMessage
            }
          }
          k += 1
        }
      }
      Iterator((file, fs.getStart, cur, dirs.map(_.toSeq), cont, dead))
    }.collect()

    val fileIdx = stats.map(_._1).distinct.sorted.zipWithIndex.toMap
    // fold the transition vectors in document order → each split's
    // ACTUAL start state; pick that machine's directives/continuations
    val startStates = scala.collection.mutable.Map[(String, Long), Int]()
    val dirBuf = scala.collection.mutable.ArrayBuffer[(Int, Long, String)]()
    var continuations = 0L
    // Multi-file semantics (documented, r16 advisor): by DEFAULT the
    // input directory is ONE logical document — files concatenate in
    // name order, exactly how the distributed dump shards a single
    // graph into part files (whole lines per file, not whole
    // statements), so scanner state legitimately crosses file
    // boundaries. For a directory of INDEPENDENT Turtle documents arm
    // graft.turtle.strictFileBoundaries / the matching env var: then a
    // file whose last split ends inside an unterminated """…""" raises
    // NAMING THE FILE instead of silently swallowing the start of the
    // next file as literal content.
    val strictFiles = sys.props.get("graft.turtle.strictFileBoundaries")
      .orElse(sys.env.get("GRAFT_TURTLE_STRICT_FILE_BOUNDARIES"))
      .exists(_.toBoolean)
    var st = StOut
    var prevFile: String = null
    stats.sortBy(s => (fileIdx(s._1), s._2)).foreach { s =>
      if (strictFiles && prevFile != null && s._1 != prevFile && st != StOut)
        throw new IllegalArgumentException(
          s"long literal left open at end of file $prevFile — malformed " +
            "Turtle (strict file boundaries armed)")
      prevFile = s._1
      if (s._6(st) != null) throw new IllegalArgumentException(s._6(st))
      startStates((s._1, s._2)) = st
      dirBuf ++= s._4(st).map { case (off, l) => (fileIdx(s._1), off, l) }
      continuations += s._5(st)
      st = s._3(st)
    }
    if (st != StOut) throw new IllegalArgumentException(
      "long literal left open at end of document — malformed Turtle")
    val multiLine = continuations > 0
    val directives = dirBuf.sortBy { case (fi, off, _) => (fi, off) }.map(_._3)
    val preamble = directives.mkString("\n")
    // reject mid-document prefix redefinition (preamble is global)
    val seen = scala.collection.mutable.Map[String, String]()
    directives.foreach { d =>
      val m = "(?i)^[ \\t]*(?:@prefix|prefix)[ \\t]+(\\S+)[ \\t]+<([^>]*)>".r
        .findFirstMatchIn(d)
      m.foreach { g =>
        seen.get(g.group(1)).filter(_ != g.group(2)).foreach { old =>
          throw new IllegalArgumentException(
            s"prefix ${g.group(1)} redefined ($old vs ${g.group(2)}) — " +
              "not supported by the distributed reader; use Turtle.load")
        }
        seen(g.group(1)) = g.group(2)
      }
    }
    val bFileIdx = spark.sparkContext.broadcast(fileIdx)

    val enc = Encoders.row(Eav.schema)
    if (!multiLine) {
      // fast path: every statement is one line (so every split starts
      // outside a literal) — parse in place, NO shuffle; (fileIdx,
      // offset) packed into a long is the unique blank-salt id
      spark.createDataFrame(
        hadoopRdd.mapPartitionsWithInputSplit { (split, it) =>
          val file = split
            .asInstanceOf[org.apache.hadoop.mapreduce.lib.input.FileSplit]
            .getPath.toString
          val fi = bFileIdx.value(file)
          it.flatMap { case (off, txt) =>
            val l = txt.toString
            val (_, dir, sig) = classify(l)
            if (!sig || dir) Nil
            else parseStatement(preamble, l, packSid(fi, off.get()))
          }
        }, Eav.schema)
    } else {
      // statement assembly: classify under each split's known start
      // state, range-sort by the (fileIdx, offset) total order, then
      // statement id = count of terminator lines strictly before
      // (per-sorted-partition counts → driver prefix sum → the
      // offsets broadcast back; the second pass over the sorted RDD
      // reuses the sort's shuffle files as a skipped stage).
      val bStates = spark.sparkContext.broadcast(startStates.toMap)
      val sorted = hadoopRdd.mapPartitionsWithInputSplit { (split, it) =>
        val fs = split
          .asInstanceOf[org.apache.hadoop.mapreduce.lib.input.FileSplit]
        val file = fs.getPath.toString
        val fi = bFileIdx.value(file).toLong
        var stp = bStates.value((file, fs.getStart))
        it.map { case (off, txt) =>
          val l = txt.toString
          val (term, dir, sig, st2) = classify(l, stp)
          stp = st2
          ((fi, off.get()), (l, term, dir, sig))
        }
      }.sortByKey()
      val termCounts = sorted.mapPartitionsWithIndex { (pid, it) =>
        var terms = 0L
        it.foreach { case (_, (_, term, _, _)) => if (term) terms += 1 }
        Iterator((pid, terms))
      }.collect().sortBy(_._1)
      val offsets = termCounts.scanLeft(0L)(_ + _._2).dropRight(1)
      val bOffsets = spark.sparkContext.broadcast(offsets)
      val withSid = sorted.mapPartitionsWithIndex { (pid, it) =>
        var n = bOffsets.value(pid)
        it.flatMap { case ((fi, off), (l, term, dir, sig)) =>
          val sid = n
          if (term) n += 1
          val key = packSid(fi.toInt, off) // in-statement order for array_sort
          if (!sig || dir) None else Some((sid, key, l))
        }
      }
      val grouped = withSid.toDF("sid", "key", "line")
        .groupBy(col("sid"))
        .agg(array_sort(collect_list(struct(col("key"), col("line"))))
          .as("ls"))
        .select(col("sid"),
          array_join(transform(col("ls"), x => x.getField("line")), "\n")
            .as("stmt"))
      grouped.flatMap(r =>
        parseStatement(preamble, r.getString(1), r.getLong(0)))(enc)
    }
  }

  // ---- prefixed dump (the writer half of the round-trip) -------------

  /** One multi-line `;`-grouped prefixed Turtle statement per subject +
    * the `@prefix` directive lines — the compact document shape that
    * exercises the reader's statement-grouping path. Stays fully
    * distributed: grouping is one shuffle on subject, formatting is
    * codegen'd string expressions. */
  def dumpPrefixedTo(triples: DataFrame, prefixes: Map[String, String],
                     path: String): Unit = {
    val ordered = prefixes.toSeq.sortBy(-_._2.length)
    def compact(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      ordered.foldRight(concat(lit("<"), c, lit(">"))) {
        case ((label, ns), acc) =>
          when(c.startsWith(ns),
            concat(lit(label + ":"), substring(c, ns.length + 1, 1000000)))
            .otherwise(acc)
      }
    val po = concat(
      when(col("p") === "rdf:type", lit("a")).otherwise(compact(col("p"))),
      lit(" "),
      when(col("o_kind") === "i" && !col("o_iri").startsWith("_:"),
        compact(col("o_iri")))
        .otherwise(Turtle.objectTermCol()))
    val body = triples
      .groupBy(col("s"))
      .agg(concat_ws(" ;\n  ", collect_list(po)).as("pos"))
      .select(concat(compact(col("s")), lit(" "), col("pos"), lit(" ."))
        .as("value"))
    val sess = triples.sparkSession
    import sess.implicits._
    val header = prefixes.toSeq
      .map(kv => s"@prefix ${kv._1}: <${kv._2}> .").toDF("value")
    header.unionByName(body).write.mode("overwrite").text(path)
  }
}

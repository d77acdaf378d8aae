package graft.sources

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.storage.Eav

/** Distributed (splittable) Turtle ingest — the two-pass design the
  * single-driver [[Turtle.load]] cannot scale past one node
  * (reference: core/triple/turtle_utils.pl bulk load; the reader here
  * is the Turtle analogue of [[NTriples]]' split-parallel line path).
  *
  * Pass 1 (tiny): collect the `@prefix`/`@base`/`PREFIX`/`BASE`
  * directive lines in document order — the only cross-document parse
  * state Turtle carries. Pass 2 (distributed): classify every line as
  * statement-terminating or continuing with a quote-aware single scan,
  * assign global statement ids by a per-partition-count prefix sum
  * (driver sees one count per partition, never data), group each
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
  * that actually use `;`-continuation line breaks.
  *
  * Restrictions (strict-raised, never silent): literals with RAW
  * newlines (`"""…"""` spanning lines) are not line-classifiable —
  * use [[Turtle.load]]; a prefix label redefined mid-document with a
  * different IRI is rejected (the preamble is applied globally). */
object TurtleDist {

  private val directiveRe =
    "(?i)^[ \\t]*(@prefix|@base|prefix[ \\t]|base[ \\t]).*".r.pattern

  /** Quote-aware one-pass line classification:
    * (endsStatement, isDirective, isSignificant). Throws on a string
    * literal left open at end of line (not line-safe Turtle). */
  private[graft] def classify(line: String): (Boolean, Boolean, Boolean) = {
    var i = 0; val n = line.length
    var last: Char = 0
    var sig = false
    while (i < n) {
      val ch = line.charAt(i)
      if (ch == '#') i = n // comment to end of line
      else if (ch == '"' || ch == '\'') {
        val q = ch
        if (i + 2 < n && line.charAt(i + 1) == q && line.charAt(i + 2) == q) {
          val close = line.indexOf("" + q + q + q, i + 3)
          if (close < 0) throw new IllegalArgumentException(
            "multi-line (raw newline) literal — not line-safe Turtle; " +
              "use Turtle.load for this document")
          i = close + 3
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
          i = j
        }
        last = '"'; sig = true; i += 1
      } else {
        if (!Character.isWhitespace(ch)) { last = ch; sig = true }
        i += 1
      }
    }
    (last == '.', sig && directiveRe.matcher(line).matches(), sig)
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
    val raw: org.apache.spark.rdd.RDD[(String, Long, String)] = {
      val nh = spark.sparkContext.newAPIHadoopFile(
        path,
        classOf[org.apache.hadoop.mapreduce.lib.input.TextInputFormat],
        classOf[org.apache.hadoop.io.LongWritable],
        classOf[org.apache.hadoop.io.Text])
        .asInstanceOf[org.apache.spark.rdd.NewHadoopRDD[
          org.apache.hadoop.io.LongWritable, org.apache.hadoop.io.Text]]
      nh.mapPartitionsWithInputSplit { (split, it) =>
        val file = split
          .asInstanceOf[org.apache.hadoop.mapreduce.lib.input.FileSplit]
          .getPath.toString
        it.map { case (off, txt) => (file, off.get(), txt.toString) }
      }
    }

    // pass 1, ONE job: per-partition → (files seen, directive lines
    // keyed by (file, offset), any-continuation-line flag). Everything
    // collected is O(files + directives), never data.
    val stats = raw.mapPartitions { it =>
      val files = scala.collection.mutable.Set[String]()
      val dirs = scala.collection.mutable.ArrayBuffer[(String, Long, String)]()
      var continuations = 0L
      it.foreach { case (f, off, l) =>
        files += f
        val (term, dir, sig) = classify(l)
        if (dir) dirs += ((f, off, l))
        else if (sig && !term) continuations += 1
      }
      Iterator((files.toSet, dirs.toSeq, continuations))
    }.collect()
    val fileIdx = stats.flatMap(_._1).distinct.sorted.zipWithIndex.toMap
    val multiLine = stats.exists(_._3 > 0)
    val directives = stats.flatMap(_._2)
      .sortBy { case (f, off, _) => (fileIdx(f), off) }.map(_._3)
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
      // fast path: every statement is one line — parse in place, NO
      // shuffle; (fileIdx, offset) packed into a long is the unique
      // blank-salt id (offsets < 2^40 per file)
      spark.createDataFrame(
        raw.mapPartitions { it =>
          it.flatMap { case (f, off, l) =>
            val (_, dir, sig) = classify(l)
            if (!sig || dir) Nil
            else parseStatement(preamble, l,
              (bFileIdx.value(f).toLong << 40) | off)
          }
        }, Eav.schema)
    } else {
      // statement assembly: range-sort by the (fileIdx, offset) total
      // order, then statement id = count of terminator lines strictly
      // before (per-sorted-partition counts → driver prefix sum → the
      // offsets broadcast back; the second pass over the sorted RDD
      // reuses the sort's shuffle files as a skipped stage).
      val sorted = raw.map { case (f, off, l) =>
        val (term, dir, sig) = classify(l)
        ((bFileIdx.value(f).toLong, off), (l, term, dir, sig))
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
          val key = (fi << 40) | off // in-statement order for array_sort
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

package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Graft
import graft.core._

/** One verified query per WOQL operator of SURVEY.md §2, each with a
  * DuckDB-equivalent oracle over the raw parquet tables. Queries run
  * through the WOQL→DataFrame compiler against the EAV encoding; the
  * oracle reconstructs the same answer relationally. */
object WoqlQueries {

  type Q = (SparkSession, String) => DataFrame

  private def woql(q: Woql)(out: (String, Column)*): Q = (spark, dir) => {
    implicit val ctx: Ctx = Graft.ctx(spark, dir)
    Compiler.run(q).select(out.map { case (n, c) => c.as(n) }: _*)
  }

  private def vStr(v: String) = col(v).getField("str")
  private def vDbl(v: String) = col(v).getField("dbl")
  private def vLng(v: String) = col(v).getField("lng")
  private def vIri(v: String) = col(v).getField("iri")
  private def vTs(v: String)  = col(v).getField("ts")
  private def vDec(v: String) = col(v).getField("dec")
  // Canonical full-scale lexical render of the exact-decimal slot. Spark's
  // Decimal(38,18)→string and DuckDB's DECIMAL(38,18)→VARCHAR both emit
  // the plain 18-fractional-digit form, so hashing the *string* is stable
  // across the two engines — hashing the raw decimal is not (the driver's
  // two sides canonicalize DECIMAL differently; values were bit-identical
  // but the r2 hash gate stayed red).
  private def vDecS(v: String) = col(v).getField("dec").cast("string")

  // §7.4 flagship: conjunction joins + literal filter + numeric comparison
  val flagship: Woql =
    Select(Seq("Name", "Bal"), And(Seq(
      TriplePat(V("C"), Node("rdf:type"), Node("tpch:Customer")),
      TriplePat(V("C"), Node("tpch:c_nationkey"), V("N")),
      TriplePat(V("N"), Node("tpch:n_name"), Str("NATION_7")),
      TriplePat(V("C"), Node("tpch:c_acctbal"), V("Bal")),
      Cmp(">", V("Bal"), Dbl(500.0)),
      TriplePat(V("C"), Node("tpch:c_name"), V("Name")))))

  private val allEdges: PathPat =
    Seq("tpch:l_orderkey", "tpch:o_custkey", "tpch:c_nationkey",
      "tpch:n_regionkey", "tpch:s_nationkey", "tpch:l_suppkey")
      .map(p => PPred(p): PathPat).reduce(PAlt(_, _))

  val queries: Map[String, Q] = Map(
    "woql_flagship" -> woql(flagship)(
      "c_name" -> vStr("Name"), "c_acctbal" -> vDbl("Bal")),

    // --- §2.1 scans ---
    "woql_triple" -> woql(
      TriplePat(V("C"), Node("tpch:c_mktsegment"), V("Seg")))(
      "s" -> vIri("C"), "seg" -> vStr("Seg")),

    "woql_quad_schema" -> woql(
      TriplePat(V("Sub"), Node("rdfs:subClassOf"), V("Sup"), g = "schema"))(
      "sub" -> vIri("Sub"), "sup" -> vIri("Sup")),

    "woql_get_csv" -> ((spark, dir) => {
      // fingerprint-keyed + atomic-rename landing (regenerated
      // testdata invalidates; concurrent sessions never see a half
      // write) — shared with the sink round-trip entries
      val csvDir = ExtQueries.landedRoundTrip("csv_nation",
        dir + "/nation.parquet")(tmp =>
        Graft.table(spark, dir, "nation").select("n_nationkey", "n_name")
          .coalesce(1).write.mode("overwrite").option("header", "true").csv(tmp))
      woql(GetCsv(Seq(("NK", "n_nationkey"), ("NName", "n_name")), csvDir))(
        "nk" -> vStr("NK"), "n_name" -> vStr("NName"))(spark, dir)
    }),

    // get over a TURTLE resource as bindings (§2.1; the reference's
    // resolve_query_resource turtle branch): one solution per parsed
    // triple — subject/predicate as IRIs, object typed
    "woql_get_turtle" -> ((spark, dir) => {
      // fingerprint-keyed single file; tmp-write + ATOMIC_MOVE so a
      // concurrent lander never reads a partial document
      val ttl = s"${Graft.cacheRoot}/ttl_region_" +
        graft.util.Fingerprint.of(dir + "/region.parquet") + ".ttl"
      if (!new java.io.File(ttl).exists()) {
        val lines = graft.sources.Turtle.dumpLines(
          graft.storage.Eav.encodeTable(
            Graft.table(spark, dir, "region"),
            org.apache.spark.sql.functions.concat(
              org.apache.spark.sql.functions.lit("tpch:region/"),
              col("r_regionkey").cast("string")),
            "tpch:Region",
            Seq(("tpch:r_name", graft.storage.Eav.PStr, col("r_name"))))
            .filter(col("p") === "tpch:r_name"))
          .collect().map(_.getString(0)).sorted
        val tmp = java.nio.file.Paths.get(
          ttl + ".tmp-" + java.util.UUID.randomUUID().toString.take(8))
        java.nio.file.Files.writeString(tmp,
          lines.mkString("", "\n", "\n"))
        try java.nio.file.Files.move(tmp, java.nio.file.Paths.get(ttl),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        catch { case _: java.nio.file.FileAlreadyExistsException =>
          java.nio.file.Files.deleteIfExists(tmp) }
      }
      woql(GetTurtle("S", "P", "O", ttl))(
        "s" -> vIri("S"), "p" -> vIri("P"), "name" -> vStr("O"))(spark, dir)
    }),

    // get over a JSON-LINES resource (§2.1 panda_json family): named
    // top-level fields bound per object, stringly like get(csv)
    "woql_get_json" -> ((spark, dir) => {
      val jd = ExtQueries.landedRoundTrip("json_nation",
        dir + "/nation.parquet")(tmp =>
        Graft.table(spark, dir, "nation").select("n_nationkey", "n_name")
          .coalesce(1).write.mode("overwrite").json(tmp))
      woql(GetJson(Seq(("NK", "n_nationkey"), ("NName", "n_name")), jd))(
        "nk" -> vStr("NK"), "n_name" -> vStr("NName"))(spark, dir)
    }),

    // get over an XML resource (§2.1 panda tabular family, beyond
    // csv/json): one solution per row element, child elements bound
    // stringly — Spark 4's built-in XML source does the parse
    "woql_get_xml" -> ((spark, dir) => {
      val xd = ExtQueries.landedRoundTrip("xml_nation",
        dir + "/nation.parquet")(tmp =>
        Graft.table(spark, dir, "nation").select("n_nationkey", "n_name")
          .coalesce(1).write.mode("overwrite").format("xml")
          .option("rowTag", "nation").save(tmp))
      woql(GetXml(Seq(("NK", "n_nationkey"), ("NName", "n_name")), xd, "nation"))(
        "nk" -> vStr("NK"), "n_name" -> vStr("NName"))(spark, dir)
    }),

    // --- §2.2 projection / predicates ---
    "woql_select_distinct" -> woql(
      Distinct(Seq("Seg"), TriplePat(V("C"), Node("tpch:c_mktsegment"), V("Seg"))))(
      "seg" -> vStr("Seg")),

    "woql_eq" -> woql(And(Seq(
      TriplePat(V("C"), Node("tpch:c_mktsegment"), V("Seg")),
      Eq(V("Seg"), Str("BUILDING")),
      TriplePat(V("C"), Node("tpch:c_name"), V("N")))))(
      "c_name" -> vStr("N")),

    "woql_cmp_less" -> woql(And(Seq(
      TriplePat(V("O"), Node("tpch:o_totalprice"), V("P")),
      Cmp("<", V("P"), Dbl(5000.0)),
      TriplePat(V("O"), Node("tpch:o_orderkey"), V("K")))))(
      "o_orderkey" -> vLng("K"), "o_totalprice" -> vDbl("P")),

    "woql_isa" -> woql(Isa(V("X"), Node("tpch:Agent")))("x" -> vIri("X")),

    "woql_subsumption" -> woql(
      Subsumption(V("Sub"), Node("tpch:Entity")))("sub" -> vIri("Sub")),

    "woql_typeof" -> woql(And(Seq(
      TriplePat(V("C"), Node("tpch:c_acctbal"), V("B")),
      TypeOf(V("B"), V("T")))))(
      "c" -> vIri("C"), "t" -> vStr("T")),

    "woql_like" -> woql(And(Seq(
      TriplePat(V("N"), Node("tpch:n_name"), V("Name")),
      LikeSim(V("Name"), Str("NATION_1"), "Sim"))))(
      "n_name" -> vStr("Name"), "sim" -> vDbl("Sim")),

    // like/3 with the reference's isub metric (Stoilos 2005) — Dice
    // stays the default; algorithm + pinned tie-break documented in
    // functions/IsubSim.scala, replayed move-for-move by the oracle's
    // recursive CTE
    "woql_like_isub" -> woql(And(Seq(
      TriplePat(V("N"), Node("tpch:n_name"), V("Name")),
      LikeSim(V("Name"), Str("NATION_1"), "Sim", metric = "isub"))))(
      "n_name" -> vStr("Name"), "sim" -> round(vDbl("Sim"), 6)),

    // --- §2.3 joins / connectives ---
    "woql_or" -> woql(And(Seq(
      TriplePat(V("C"), Node("tpch:c_mktsegment"), V("Seg")),
      Or(Seq(Eq(V("Seg"), Str("BUILDING")), Eq(V("Seg"), Str("AUTOMOBILE")))),
      TriplePat(V("C"), Node("tpch:c_name"), V("N")))))(
      "c_name" -> vStr("N"), "seg" -> vStr("Seg")),

    "woql_not" -> woql(And(Seq(
      TriplePat(V("C"), Node("rdf:type"), Node("tpch:Customer")),
      Not(TriplePat(V("O"), Node("tpch:o_custkey"), V("C"))))))(
      "c" -> vIri("C")),

    "woql_opt" -> woql(And(Seq(
      TriplePat(V("C"), Node("rdf:type"), Node("tpch:Customer")),
      Opt(And(Seq(
        TriplePat(V("O"), Node("tpch:o_custkey"), V("C")),
        TriplePat(V("O"), Node("tpch:o_totalprice"), V("P"))))))))(
      "c" -> vIri("C"), "price" -> vDbl("P")),

    // deterministic once binds the least solution → oracle-able as min()
    "woql_once" -> woql(
      Once(TriplePat(V("C"), Node("rdf:type"), Node("tpch:Customer"))))(
      "c" -> vIri("C")),

    // immediately(Q): eager side-effects are unobservable under staged
    // updates — accepted and equivalent to Q (Ast.scala Immediately)
    "woql_immediately" -> woql(
      Immediately(TriplePat(V("N"), Node("tpch:n_name"), V("Name"))))(
      "s" -> vIri("N"), "nm" -> vStr("Name")),

    // --- §2.4 aggregates / modifiers ---
    "woql_group_count" -> woql(And(Seq(
      GroupBy(Seq("O"), Seq("St"),
        TriplePat(V("O"), Node("tpch:o_orderstatus"), V("St")), "L"),
      LengthList("L", "N"))))(
      "st" -> vStr("St"), "n" -> vLng("N")),

    "woql_group_sum" -> woql(And(Seq(
      GroupBy(Seq("Q"), Seq("F"), And(Seq(
        TriplePat(V("L"), Node("tpch:l_returnflag"), V("F")),
        TriplePat(V("L"), Node("tpch:l_quantity"), V("Q")))), "Lst"),
      SumList("Lst", "S"))))(
      "flag" -> vStr("F"), "sum_qty" -> vDbl("S")),

    "woql_count" -> woql(
      CountQ(TriplePat(V("S"), Node("rdf:type"), Node("tpch:Orders")), "N"))(
      "n" -> vLng("N")),

    // exact decimal SUM: the grouped aggregate keeps (38,18) when every
    // group member is decimal-typed
    "woql_group_sum_dec" -> woql(And(Seq(
      GroupBy(Seq("P"), Seq("St"), And(Seq(
        TriplePat(V("O"), Node("tpch:o_orderstatus"), V("St")),
        TriplePat(V("O"), Node("tpch:o_totalprice_dec"), V("P")))), "Lst"),
      SumList("Lst", "S"))))(
      "st" -> vStr("St"), "total" -> vDecS("S")),

    "woql_order_limit" -> woql(
      Limit(5, OrderBy(Seq(("Bal", false), ("Name", true)), And(Seq(
        TriplePat(V("C"), Node("tpch:c_acctbal"), V("Bal")),
        TriplePat(V("C"), Node("tpch:c_name"), V("Name")))))))(
      "c_name" -> vStr("Name"), "c_acctbal" -> vDbl("Bal")),

    "woql_start" -> woql(
      Limit(5, Start(3, OrderBy(Seq(("Bal", false), ("Name", true)), And(Seq(
        TriplePat(V("C"), Node("tpch:c_acctbal"), V("Bal")),
        TriplePat(V("C"), Node("tpch:c_name"), V("Name"))))))))(
      "c_name" -> vStr("Name"), "c_acctbal" -> vDbl("Bal")),

    "woql_join_list" -> woql(And(Seq(
      GroupBy(Seq("N"), Seq("Seg"), And(Seq(
        TriplePat(V("C"), Node("tpch:c_mktsegment"), V("Seg")),
        TriplePat(V("C"), Node("tpch:c_name"), V("N")))), "L0"),
      SortListQ("L0", "L"),
      JoinS("L", ",", "Names"))))(
      "seg" -> vStr("Seg"), "names" -> vStr("Names")),

    // --- §2.6 scalar ops ---
    "woql_eval" -> woql(And(Seq(
      TriplePat(V("L"), Node("tpch:l_extendedprice"), V("P")),
      TriplePat(V("L"), Node("tpch:l_discount"), V("D")),
      Eval(ABin("*", ATerm(V("P")), ABin("-", ATerm(Dbl(1.0)), ATerm(V("D")))), "R"))))(
      "l" -> vIri("L"), "r" -> vDbl("R")),

    "woql_eval2" -> woql(And(Seq(
      TriplePat(V("O"), Node("tpch:o_totalprice"), V("P")),
      Eval(AFloor(ABin("/", ATerm(V("P")), ATerm(Dbl(100.0)))), "Bucket"),
      TriplePat(V("O"), Node("tpch:o_orderkey"), V("K")))))(
      "o_orderkey" -> vLng("K"), "bucket" -> vDbl("Bucket")),

    "woql_concat" -> woql(And(Seq(
      TriplePat(V("C"), Node("tpch:c_name"), V("N")),
      TriplePat(V("C"), Node("tpch:c_mktsegment"), V("Seg")),
      ConcatList(Seq(V("N"), Str(":"), V("Seg")), "X"))))(
      "x" -> vStr("X")),

    "woql_strings" -> woql(And(Seq(
      TriplePat(V("C"), Node("tpch:c_name"), V("N")),
      UpperS(V("N"), "U"), LowerS(V("N"), "Lo"),
      TrimS(V("N"), "T"))))(
      "u" -> vStr("U"), "lo" -> vStr("Lo"), "t" -> vStr("T")),

    "woql_pad" -> woql(And(Seq(
      TriplePat(V("N"), Node("tpch:n_name"), V("Name")),
      PadS(V("Name"), "*", Lng(12), "P"))))(
      "p" -> vStr("P")),

    "woql_split_member" -> woql(And(Seq(
      TriplePat(V("C"), Node("tpch:c_name"), V("N")),
      SplitS(V("N"), "#", "Parts"),
      MemberQ("W", "Parts"))))(
      "c" -> vIri("C"), "w" -> vStr("W")),

    "woql_substr" -> woql(And(Seq(
      TriplePat(V("C"), Node("tpch:c_name"), V("N")),
      SubstrS(V("N"), Lng(9), Lng(9), "After", "Sub"))))(
      "sub" -> vStr("Sub"), "aft" -> vLng("After")),

    "woql_re" -> woql(And(Seq(
      TriplePat(V("C"), Node("tpch:c_name"), V("N")),
      ReMatch("Customer#(\\d+)", V("N"), "G"),
      MemberQ("D", "G"))))(
      "d" -> vStr("D")),

    "woql_format" -> woql(And(Seq(
      TriplePat(V("C"), Node("tpch:c_name"), V("N")),
      TriplePat(V("C"), Node("tpch:c_mktsegment"), V("Seg")),
      FormatS("%s/%s", Seq(V("N"), V("Seg")), "X"))))(
      "x" -> vStr("X")),

    // xdd: extension literal types (§2.6 typecast matrix extension):
    // lexical validation + canonicalization (whitespace dropped,
    // components re-joined verbatim) and range ordering checks —
    // [p_size,p_partkey] is a valid range only when size <= key, so
    // validity is data-dependent and the oracle replays it
    "woql_cast_xdd" -> woql(And(Seq(
      TriplePat(V("P"), Node("tpch:p_partkey"), V("K")),
      TriplePat(V("P"), Node("tpch:p_size"), V("S")),
      FormatS("[ %s , %s ]", Seq(V("S"), V("K")), "CoordS"),
      CastQ(V("CoordS"), "xdd:coordinate", "Coord"),
      FormatS("[%s,%s]", Seq(V("S"), V("K")), "RangeS"),
      CastQ(V("RangeS"), "xdd:integerRange", "IRng"),
      CastQ(V("RangeS"), "xdd:decimalRange", "DRng"))))(
      "p" -> vIri("P"), "coord" -> vStr("Coord"),
      "irng" -> vStr("IRng"), "drng" -> vStr("DRng")),

    // typed xsd:duration cast (§2.6 matrix completion): lexicals
    // synthesized from order keys so every canonicalization path runs —
    // month→year carry, second→hour/minute carry, fractional seconds
    // (".0" canonicalizes away), the zero duration (PT0S), and invalid
    // lexicals (negative component ⇒ null) on row-dependent inputs.
    "woql_cast_duration" -> woql(And(Seq(
      TriplePat(V("O"), Node("tpch:o_orderkey"), V("K")),
      Eval(ABin("-", ATerm(V("K")), ABin("*", ATerm(Lng(25)),
        ABin("div", ATerm(V("K")), ATerm(Lng(25))))), "M"),
      Eval(ABin("-", ATerm(V("K")), ABin("*", ATerm(Lng(7000)),
        ABin("div", ATerm(V("K")), ATerm(Lng(7000))))), "S"),
      Eval(ABin("-", ATerm(V("K")), ABin("*", ATerm(Lng(4)),
        ABin("div", ATerm(V("K")), ATerm(Lng(4))))), "F"),
      Eval(ABin("-", ATerm(V("M")), ATerm(Lng(12))), "M2"),
      // eval arithmetic is double-typed; the lexical needs integer
      // renderings ("12", not "12.0")
      CastQ(V("M"), "xsd:integer", "MI"),
      CastQ(V("S"), "xsd:integer", "SI"),
      CastQ(V("F"), "xsd:integer", "FI"),
      CastQ(V("M2"), "xsd:integer", "M2I"),
      FormatS("P%sMT%s.%sS", Seq(V("MI"), V("SI"), V("FI")), "L1"),
      FormatS("P%sYT%sS", Seq(V("M2I"), V("SI")), "L2"),
      CastQ(V("L1"), "xsd:duration", "D1"),
      CastQ(V("L2"), "xsd:duration", "D2"))))(
      "o" -> vIri("O"), "d1" -> vStr("D1"), "d2" -> vStr("D2")),

    "woql_member_const" -> woql(
      MemberConst("X", Seq(Str("alpha"), Str("beta"), Str("gamma"))))(
      "x" -> vStr("X")),

    "woql_cast_str" -> woql(And(Seq(
      TriplePat(V("N"), Node("tpch:n_nationkey"), V("NK")),
      CastQ(V("NK"), "xsd:string", "S"))))(
      "n" -> vIri("N"), "s" -> vStr("S")),

    "woql_cast_num" -> woql(And(Seq(
      TriplePat(V("P"), Node("tpch:p_size"), V("Sz")),
      CastQ(V("Sz"), "xsd:double", "D"),
      TriplePat(V("P"), Node("tpch:p_partkey"), V("K")))))(
      "p_partkey" -> vLng("K"), "d" -> vDbl("D")),

    // exact xsd:decimal: typed storage slot, lossless casts both ways
    "woql_cast_dec" -> woql(And(Seq(
      TriplePat(V("O"), Node("tpch:o_totalprice_dec"), V("P")),
      CastQ(V("P"), "xsd:string", "S"),
      TriplePat(V("O"), Node("tpch:o_orderkey"), V("K")),
      CastQ(V("K"), "xsd:decimal", "KD"))))(
      "o_orderkey" -> vLng("K"), "d" -> vDecS("P"), "s" -> vStr("S"),
      "kd" -> vDecS("KD")),

    // xsd:dateTime round-trip through the lenient parser (XsdTimestampCast
    // attempt #4: zone-less space-separated render — ref
    // core/util/xsd_parser.pl + speculative_parse.pl)
    "woql_cast_date" -> woql(And(Seq(
      TriplePat(V("O"), Node("tpch:o_orderdate"), V("D")),
      CastQ(V("D"), "xsd:string", "S"),
      CastQ(V("S"), "xsd:dateTime", "T"))))(
      "o" -> vIri("O"), "s" -> vStr("S"), "t" -> vTs("T")),

    // exact decimal arithmetic in eval: 2×price − 10, no double rounding
    "woql_eval_dec" -> woql(And(Seq(
      TriplePat(V("O"), Node("tpch:o_totalprice_dec"), V("P")),
      Eval(ABin("-", ABin("+", ATerm(V("P")), ATerm(V("P"))), ATerm(Lng(10))), "R"),
      TriplePat(V("O"), Node("tpch:o_orderkey"), V("K")))))(
      "o_orderkey" -> vLng("K"), "r" -> vDecS("R")),

    // when(Cond, Then): conditional extension — Then-vars bind only
    // where Cond holds, other solutions pass through
    "woql_when" -> woql(And(Seq(
      TriplePat(V("C"), Node("tpch:c_mktsegment"), V("Seg")),
      TriplePat(V("C"), Node("tpch:c_name"), V("N")),
      WhenQ(Eq(V("Seg"), Str("BUILDING")),
        ConcatList(Seq(V("N"), Str("-b")), "Tag")))))(
      "c_name" -> vStr("N"), "tag" -> vStr("Tag")),

    // multi-group re: every capture group of the first match binds
    "woql_re_groups" -> woql(And(Seq(
      TriplePat(V("C"), Node("tpch:c_name"), V("N")),
      ReMatch("Customer#(\\d)(\\d+)", V("N"), "G"),
      JoinS("G", "-", "J"))))(
      "j" -> vStr("J")),

    "woql_hashkey" -> woql(And(Seq(
      TriplePat(V("C"), Node("tpch:c_name"), V("N")),
      HashKey("doc:", Seq(V("N")), "U"))))(
      "u" -> vIri("U")),

    "woql_lexkey" -> woql(And(Seq(
      TriplePat(V("C"), Node("tpch:c_name"), V("N")),
      LexKey("cust:", Seq(V("N")), "U"))))(
      "u" -> vIri("U")),

    // --- §2.7 path queries ---
    "woql_path_seq" -> woql(
      PathQ(V("L"), PSeq(PPred("tpch:l_orderkey"), PPred("tpch:o_custkey")), V("C")))(
      "l" -> vIri("L"), "c" -> vIri("C")),

    "woql_path_star" -> woql(
      PathQ(Node("tpch:nation/3"), PStar(PPred("tpch:n_regionkey")), V("Y")))(
      "y" -> vIri("Y")),

    "woql_path_inv_plus" -> woql(
      PathQ(Node("tpch:region/2"), PPlus(PInv("tpch:n_regionkey")), V("Y")))(
      "y" -> vIri("Y")),

    "woql_path_times" -> woql(
      PathQ(V("X"), PTimes(PAlt(PPred("tpch:l_orderkey"), PPred("tpch:o_custkey")), 2, 2), V("Y")))(
      "x" -> vIri("X"), "y" -> vIri("Y")),

    "woql_path_plus_alt" -> woql(
      PathQ(V("X"), PPlus(allEdges), Node("tpch:region/0")))(
      "x" -> vIri("X")),

    // min-hop distances (PathDistQ): multi-source BFS over the FK-chain
    // step relation — orders→customer→nation→region gives dists 1..3
    "woql_path_shortest" -> woql(
      PathDistQ(V("X"),
        PAlt(PPred("tpch:o_custkey"),
          PAlt(PPred("tpch:c_nationkey"), PPred("tpch:n_regionkey"))),
        V("Y"), "D"))(
      "x" -> vIri("X"), "y" -> vIri("Y"), "d" -> vLng("D")),

    // canonical witness (PathQ): one shortest/lexicographically-least
    // node sequence per reachable node
    "woql_path_witness_canon" -> woql(
      PathQ(Node("tpch:nation/3"), PStar(PPred("tpch:n_regionkey")),
        V("Y"), witness = Some("W")))(
      "y" -> vIri("Y"), "w" -> vStr("W")),

    // exhaustive witness enumeration: the region→nation→region diamond
    // yields one distinct path per nation of the region
    "woql_path_witness" -> woql(
      PathAllQ(Node("tpch:region/0"),
        PSeq(PInv("tpch:n_regionkey"), PPred("tpch:n_regionkey")),
        V("Y"), "W"))(
      "y" -> vIri("Y"), "w" -> vStr("W")),

    // canonical witness WITH edge objects: the zero-hop solution binds
    // an empty edge list, the one-hop one its traversed triple
    "woql_path_witness_canon_edges" -> woql(
      PathQ(Node("tpch:nation/3"), PStar(PPred("tpch:n_regionkey")),
        V("Y"), witness = Some("W"), edgesVar = Some("E")))(
      "y" -> vIri("Y"), "w" -> vStr("W"), "e" -> vStr("E")),

    // edge-object witness: same diamond, but the witness also binds
    // the traversed TRIPLES ("s|p|o" per step, ';'-joined) — the
    // reference's edge-list witness shape; note the inverse first hop
    // still records the STORED direction (nation → region)
    "woql_path_witness_edges" -> woql(
      PathAllQ(Node("tpch:region/0"),
        PSeq(PInv("tpch:n_regionkey"), PPred("tpch:n_regionkey")),
        V("Y"), "W", edgesVar = Some("E")))(
      "y" -> vIri("Y"), "w" -> vStr("W"), "e" -> vStr("E")),

    // bounded times over an alternation: every 1- and 2-hop inverse
    // chain region→nation(→customer), each path enumerated
    "woql_path_witness_times" -> woql(
      PathAllQ(Node("tpch:region/0"),
        PTimes(PAlt(PInv("tpch:n_regionkey"), PInv("tpch:c_nationkey")), 1, 2),
        V("Y"), "W"))(
      "y" -> vIri("Y"), "w" -> vStr("W"))
  )

  /** Lineitem subject IRI in DuckDB terms (matches Eav.encodeAll). */
  private val lidSql =
    "'tpch:lineitem/'||md5(l_orderkey||'|'||l_linenumber||'|'||l_partkey||'|'||l_suppkey||'|'||l_quantity)"

  /** DuckDB SQL equivalents (same column names as the Spark output). */
  val oracleSql: Map[String, String] = Map(
    "woql_flagship" ->
      """SELECT c_name, c_acctbal FROM customer JOIN nation
        | ON c_nationkey = n_nationkey
        | WHERE n_name = 'NATION_7' AND c_acctbal > 500.0""".stripMargin,

    "woql_triple" ->
      "SELECT 'tpch:customer/'||c_custkey AS s, c_mktsegment AS seg FROM customer",

    "woql_quad_schema" ->
      """SELECT * FROM (VALUES
        | ('tpch:Customer','tpch:Agent'), ('tpch:Supplier','tpch:Agent'),
        | ('tpch:Agent','tpch:Entity'), ('tpch:Orders','tpch:Entity'),
        | ('tpch:Lineitem','tpch:Entity'), ('tpch:Part','tpch:Entity'),
        | ('tpch:Nation','tpch:Entity'), ('tpch:Region','tpch:Entity'))
        | t(sub, sup)""".stripMargin,

    "woql_get_csv" ->
      "SELECT CAST(n_nationkey AS VARCHAR) AS nk, n_name FROM nation",

    "woql_get_turtle" ->
      """SELECT 'tpch:region/'||r_regionkey AS s, 'tpch:r_name' AS p,
        | r_name AS name FROM region""".stripMargin,

    "woql_get_json" ->
      "SELECT CAST(n_nationkey AS VARCHAR) AS nk, n_name FROM nation",

    "woql_get_xml" ->
      "SELECT CAST(n_nationkey AS VARCHAR) AS nk, n_name FROM nation",

    "woql_select_distinct" ->
      "SELECT DISTINCT c_mktsegment AS seg FROM customer",

    "woql_eq" ->
      "SELECT c_name FROM customer WHERE c_mktsegment = 'BUILDING'",

    "woql_cmp_less" ->
      "SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice < 5000.0",

    "woql_isa" ->
      """SELECT 'tpch:customer/'||c_custkey AS x FROM customer
        | UNION ALL SELECT 'tpch:supplier/'||s_suppkey FROM supplier""".stripMargin,

    "woql_subsumption" ->
      """SELECT * FROM (VALUES ('tpch:Customer'),('tpch:Supplier'),('tpch:Agent'),
        | ('tpch:Orders'),('tpch:Lineitem'),('tpch:Part'),('tpch:Nation'),
        | ('tpch:Region'),('tpch:Entity')) t(sub)""".stripMargin,

    "woql_typeof" ->
      "SELECT 'tpch:customer/'||c_custkey AS c, 'xsd:double' AS t FROM customer",

    "woql_like" ->
      """SELECT n_name, 2.0*len(list_intersect(
        |   list_distinct(list_transform(range(1, len(n_name)), i -> substr(n_name, CAST(i AS INT), 2))),
        |   list_distinct(list_transform(range(1, len('NATION_1')), i -> substr('NATION_1', CAST(i AS INT), 2)))))
        | / (len(list_distinct(list_transform(range(1, len(n_name)), i -> substr(n_name, CAST(i AS INT), 2))))
        |    + len(list_distinct(list_transform(range(1, len('NATION_1')), i -> substr('NATION_1', CAST(i AS INT), 2)))))
        | AS sim FROM nation""".stripMargin,

    // full isub replay: iterative longest-common-substring removal as a
    // recursive CTE (tie-break: length desc, start-in-s1 asc, first
    // occurrence in s2 = strpos), then the Stoilos commonality /
    // dissimilarity / winkler terms in the engine's operation order
    "woql_like_isub" ->
      """WITH RECURSIVE it AS (
        |  SELECT n_name, lower(n_name) AS s1, 'nation_1' AS s2,
        |    CAST(0 AS BIGINT) AS common, len(n_name) AS l1,
        |    CAST(8 AS BIGINT) AS l2
        |  FROM nation
        |  UNION ALL
        |  SELECT i.n_name,
        |    substr(i.s1, 1, best.st - 1) || substr(i.s1, best.st + best.L) AS s1,
        |    substr(i.s2, 1, best.j - 1) || substr(i.s2, best.j + best.L) AS s2,
        |    i.common + best.L, i.l1, i.l2
        |  FROM it i JOIN LATERAL (
        |    SELECT t.L AS L, t.st AS st, strpos(i.s2, substr(i.s1, t.st, t.L)) AS j
        |    FROM (SELECT ll.L, ss.st
        |          FROM (SELECT unnest(range(3, len(i.s1) + 1)) AS L) ll,
        |               (SELECT unnest(range(1, len(i.s1) + 1)) AS st) ss
        |          WHERE ss.st + ll.L - 1 <= len(i.s1)) t
        |    WHERE strpos(i.s2, substr(i.s1, t.st, t.L)) > 0
        |    ORDER BY t.L DESC, t.st ASC LIMIT 1
        |  ) best ON true
        | ),
        | fin AS (SELECT n_name, max(common) AS common, any_value(l1) AS l1,
        |          any_value(l2) AS l2 FROM it GROUP BY 1),
        | sc AS (
        |  SELECT f.n_name,
        |    2.0 * f.common / (f.l1 + f.l2) AS c,
        |    greatest(f.l1 - f.common, 0) / f.l1 AS u1,
        |    greatest(f.l2 - f.common, 0) / f.l2 AS u2,
        |    (SELECT coalesce(max(k), 0) FROM (SELECT unnest(range(1, 5)) AS k)
        |      WHERE k <= least(f.l1, f.l2)
        |        AND substr(lower(f.n_name), 1, CAST(k AS INT))
        |            = substr('nation_1', 1, CAST(k AS INT))) AS pre
        |  FROM fin f)
        | SELECT n_name,
        |  round(c - (u1 * u2) / (0.6 + (1 - 0.6) * (u1 + u2 - u1 * u2))
        |          + pre * 0.1 * (1 - c), 6) AS sim
        | FROM sc""".stripMargin,

    "woql_or" ->
      """SELECT c_name, c_mktsegment AS seg FROM customer
        | WHERE c_mktsegment IN ('BUILDING','AUTOMOBILE')""".stripMargin,

    "woql_not" ->
      """SELECT 'tpch:customer/'||c_custkey AS c FROM customer
        | WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,

    "woql_opt" ->
      """SELECT 'tpch:customer/'||c_custkey AS c, o_totalprice AS price
        | FROM customer LEFT JOIN orders ON o_custkey = c_custkey""".stripMargin,

    "woql_group_count" ->
      "SELECT o_orderstatus AS st, count(*) AS n FROM orders GROUP BY 1",

    "woql_group_sum" ->
      "SELECT l_returnflag AS flag, sum(l_quantity) AS sum_qty FROM lineitem GROUP BY 1",

    "woql_count" ->
      "SELECT count(*) AS n FROM orders",

    // deterministic once = least solution under the binding total order
    // (here: lexicographically least customer IRI)
    "woql_once" ->
      "SELECT min('tpch:customer/'||c_custkey) AS c FROM customer",

    "woql_immediately" ->
      "SELECT 'tpch:nation/'||n_nationkey AS s, n_name AS nm FROM nation",

    "woql_group_sum_dec" ->
      """SELECT o_orderstatus AS st,
        | CAST(CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DECIMAL(38,18)))
        |   AS DECIMAL(38,18)) AS VARCHAR) AS total
        | FROM orders GROUP BY 1""".stripMargin,

    "woql_order_limit" ->
      """SELECT c_name, c_acctbal FROM customer
        | ORDER BY c_acctbal DESC, c_name LIMIT 5""".stripMargin,

    "woql_start" ->
      """SELECT c_name, c_acctbal FROM customer
        | ORDER BY c_acctbal DESC, c_name LIMIT 5 OFFSET 3""".stripMargin,

    "woql_join_list" ->
      """SELECT c_mktsegment AS seg,
        | array_to_string(list_sort(list(c_name)), ',') AS names
        | FROM customer GROUP BY 1""".stripMargin,

    "woql_eval" ->
      s"""SELECT $lidSql AS l,
        | l_extendedprice * (1.0 - l_discount) AS r FROM lineitem""".stripMargin,

    "woql_eval2" ->
      "SELECT o_orderkey, floor(o_totalprice / 100.0) AS bucket FROM orders",

    "woql_concat" ->
      "SELECT c_name || ':' || c_mktsegment AS x FROM customer",

    "woql_strings" ->
      """SELECT upper(c_name) AS u, lower(c_name) AS lo, trim(c_name) AS t
        | FROM customer""".stripMargin,

    "woql_pad" ->
      "SELECT lpad(n_name, 12, '*') AS p FROM nation",

    "woql_split_member" ->
      """SELECT 'tpch:customer/'||c_custkey AS c,
        | unnest(string_split(c_name, '#')) AS w FROM customer""".stripMargin,

    "woql_substr" ->
      """SELECT substring(c_name, 10, 9) AS sub,
        | length(c_name) - 9 - 9 AS aft FROM customer""".stripMargin,

    "woql_re" ->
      """SELECT regexp_extract(c_name, 'Customer#(\d+)', 1) AS d FROM customer""",

    "woql_format" ->
      "SELECT c_name || '/' || c_mktsegment AS x FROM customer",

    "woql_cast_xdd" ->
      """SELECT 'tpch:part/'||p_partkey AS p,
        | '['||p_size||','||p_partkey||']' AS coord,
        | CASE WHEN p_size <= p_partkey
        |   THEN '['||p_size||','||p_partkey||']' END AS irng,
        | CASE WHEN p_size <= p_partkey
        |   THEN '['||p_size||','||p_partkey||']' END AS drng
        | FROM part""".stripMargin,

    // independent re-implementation of XSD duration canonicalization in
    // SQL: same integer decompositions (m months, s seconds, f tenths)
    "woql_cast_duration" ->
      """WITH t AS (SELECT o_orderkey AS k, o_orderkey % 25 AS m,
        |   o_orderkey % 7000 AS s, o_orderkey % 4 AS f FROM orders)
        |SELECT 'tpch:orders/'||k AS o,
        | CASE WHEN m=0 AND s=0 AND f=0 THEN 'PT0S' ELSE 'P' ||
        |  CASE WHEN m//12 > 0 THEN (m//12)::VARCHAR||'Y' ELSE '' END ||
        |  CASE WHEN m%12 > 0 THEN (m%12)::VARCHAR||'M' ELSE '' END ||
        |  CASE WHEN s > 0 OR f > 0 THEN 'T' ||
        |   CASE WHEN s//3600 > 0 THEN (s//3600)::VARCHAR||'H' ELSE '' END ||
        |   CASE WHEN (s%3600)//60 > 0 THEN ((s%3600)//60)::VARCHAR||'M' ELSE '' END ||
        |   CASE WHEN s%60 > 0 OR f > 0 THEN (s%60)::VARCHAR ||
        |    CASE WHEN f > 0 THEN '.'||f::VARCHAR ELSE '' END || 'S'
        |   ELSE '' END
        |  ELSE '' END
        | END AS d1,
        | CASE WHEN m < 12 THEN NULL
        |  WHEN m=12 AND s=0 THEN 'PT0S' ELSE 'P' ||
        |  CASE WHEN m-12 > 0 THEN (m-12)::VARCHAR||'Y' ELSE '' END ||
        |  CASE WHEN s > 0 THEN 'T' ||
        |   CASE WHEN s//3600 > 0 THEN (s//3600)::VARCHAR||'H' ELSE '' END ||
        |   CASE WHEN (s%3600)//60 > 0 THEN ((s%3600)//60)::VARCHAR||'M' ELSE '' END ||
        |   CASE WHEN s%60 > 0 THEN (s%60)::VARCHAR||'S' ELSE '' END
        |  ELSE '' END
        | END AS d2
        |FROM t""".stripMargin,

    "woql_member_const" ->
      "SELECT unnest(['alpha','beta','gamma']) AS x",

    "woql_cast_str" ->
      """SELECT 'tpch:nation/'||n_nationkey AS n,
        | CAST(n_nationkey AS VARCHAR) AS s FROM nation""".stripMargin,

    "woql_cast_num" ->
      "SELECT p_partkey, CAST(p_size AS DOUBLE) AS d FROM part",

    "woql_cast_dec" ->
      """SELECT o_orderkey,
        | CAST(CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DECIMAL(38,18)) AS VARCHAR) AS d,
        | CAST(CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DECIMAL(38,18)) AS VARCHAR) AS s,
        | CAST(CAST(o_orderkey AS DECIMAL(38,18)) AS VARCHAR) AS kd
        | FROM orders""".stripMargin,

    "woql_cast_date" ->
      """SELECT 'tpch:orders/' || o_orderkey AS o,
        | CAST(o_orderdate AS VARCHAR) AS s,
        | CAST(CAST(o_orderdate AS VARCHAR) AS TIMESTAMP) AS t
        | FROM orders""".stripMargin,

    "woql_eval_dec" ->
      """SELECT o_orderkey,
        | CAST(CAST(CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DECIMAL(38,18))
        |   + CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DECIMAL(38,18))
        |   - 10 AS DECIMAL(38,18)) AS VARCHAR) AS r
        | FROM orders""".stripMargin,

    "woql_when" ->
      """SELECT c_name, CASE WHEN c_mktsegment = 'BUILDING'
        | THEN c_name || '-b' END AS tag FROM customer""".stripMargin,

    "woql_re_groups" ->
      """SELECT regexp_extract(c_name, 'Customer#(\d)(\d+)', 1) || '-' ||
        | regexp_extract(c_name, 'Customer#(\d)(\d+)', 2) AS j FROM customer""".stripMargin,

    "woql_hashkey" ->
      "SELECT 'doc:' || sha256(c_name) AS u FROM customer",

    "woql_lexkey" ->
      "SELECT 'cust:' || replace(c_name, '#', '%23') AS u FROM customer",

    "woql_path_seq" ->
      s"""SELECT $lidSql AS l,
        | 'tpch:customer/'||o_custkey AS c
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey""".stripMargin,

    "woql_path_star" ->
      """SELECT 'tpch:nation/3' AS y
        | UNION SELECT 'tpch:region/'||n_regionkey FROM nation WHERE n_nationkey = 3""".stripMargin,

    "woql_path_inv_plus" ->
      "SELECT 'tpch:nation/'||n_nationkey AS y FROM nation WHERE n_regionkey = 2",

    "woql_path_shortest" ->
      """WITH RECURSIVE e AS (
        |  SELECT 'tpch:orders/'||o_orderkey AS src,
        |         'tpch:customer/'||o_custkey AS dst FROM orders
        |  UNION ALL SELECT 'tpch:customer/'||c_custkey,
        |         'tpch:nation/'||c_nationkey FROM customer
        |  UNION ALL SELECT 'tpch:nation/'||n_nationkey,
        |         'tpch:region/'||n_regionkey FROM nation),
        | bfs AS (SELECT src, dst, 1 AS dist FROM e
        |  UNION ALL SELECT b.src, e.dst, b.dist + 1
        |   FROM bfs b JOIN e ON b.dst = e.src)
        | SELECT src AS x, dst AS y, min(dist) AS d FROM bfs GROUP BY 1, 2""".stripMargin,

    "woql_path_times" ->
      s"""SELECT DISTINCT $lidSql AS x,
        | 'tpch:customer/'||o_custkey AS y
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey""".stripMargin,

    "woql_path_witness_canon" ->
      """SELECT 'tpch:nation/3' AS y, 'tpch:nation/3' AS w
        | UNION ALL
        | SELECT 'tpch:region/'||n_regionkey,
        |   'tpch:nation/3/tpch:region/'||n_regionkey
        | FROM nation WHERE n_nationkey = 3""".stripMargin,

    "woql_path_witness" ->
      """SELECT 'tpch:region/0' AS y,
        | 'tpch:region/0/tpch:nation/'||n_nationkey||'/tpch:region/0' AS w
        | FROM nation WHERE n_regionkey = 0""".stripMargin,

    "woql_path_witness_canon_edges" ->
      """SELECT 'tpch:nation/3' AS y, 'tpch:nation/3' AS w, '' AS e
        | UNION ALL
        | SELECT 'tpch:region/'||n_regionkey,
        |   'tpch:nation/3/tpch:region/'||n_regionkey,
        |   'tpch:nation/3|tpch:n_regionkey|tpch:region/'||n_regionkey
        | FROM nation WHERE n_nationkey = 3""".stripMargin,

    "woql_path_witness_edges" ->
      """SELECT 'tpch:region/0' AS y,
        | 'tpch:region/0/tpch:nation/'||n_nationkey||'/tpch:region/0' AS w,
        | 'tpch:nation/'||n_nationkey||'|tpch:n_regionkey|tpch:region/0;'||
        |   'tpch:nation/'||n_nationkey||'|tpch:n_regionkey|tpch:region/0' AS e
        | FROM nation WHERE n_regionkey = 0""".stripMargin,

    "woql_path_witness_times" ->
      """SELECT 'tpch:nation/'||n_nationkey AS y,
        | 'tpch:region/0/tpch:nation/'||n_nationkey AS w
        | FROM nation WHERE n_regionkey = 0
        | UNION ALL
        | SELECT 'tpch:customer/'||c_custkey,
        | 'tpch:region/0/tpch:nation/'||n_nationkey||'/tpch:customer/'||c_custkey
        | FROM customer JOIN nation ON c_nationkey = n_nationkey
        | WHERE n_regionkey = 0""".stripMargin,

    "woql_path_plus_alt" ->
      s"""WITH n0 AS (SELECT n_nationkey FROM nation WHERE n_regionkey = 0),
        | c0 AS (SELECT c_custkey FROM customer WHERE c_nationkey IN (SELECT n_nationkey FROM n0)),
        | s0 AS (SELECT s_suppkey FROM supplier WHERE s_nationkey IN (SELECT n_nationkey FROM n0)),
        | o0 AS (SELECT o_orderkey FROM orders WHERE o_custkey IN (SELECT c_custkey FROM c0))
        | SELECT 'tpch:nation/'||n_nationkey AS x FROM n0
        | UNION SELECT 'tpch:customer/'||c_custkey FROM c0
        | UNION SELECT 'tpch:supplier/'||s_suppkey FROM s0
        | UNION SELECT 'tpch:orders/'||o_orderkey FROM o0
        | UNION SELECT $lidSql FROM lineitem
        |   WHERE l_orderkey IN (SELECT o_orderkey FROM o0)
        |      OR l_suppkey IN (SELECT s_suppkey FROM s0)""".stripMargin
  )
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.Xdd

/** xdd: extension literal types — lexical validation, canonical form,
  * range-ordering semantics (SURVEY §2.6 typecast extension). */
class XddSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def run(f: Column => Column, in: String): Option[String] =
    Seq(in).toDF("v").select(f(col("v")).as("r"))
      .collect().headOption.flatMap(r => Option(r.getString(0)))

  test("coordinate canonicalizes whitespace and rejects garbage") {
    assert(run(Xdd.coordinate(_), "[ 1.5 , -2 ]").contains("[1.5,-2]"))
    assert(run(Xdd.coordinate(_), "1.5,2").isEmpty)
    assert(run(Xdd.coordinate(_), "[a,b]").isEmpty)
    assert(run(Xdd.coordinate(_), "[1,2,3]").isEmpty)
  }

  test("integerRange enforces ordering and integer lexicals") {
    assert(run(Xdd.integerRange(_), "[3,7]").contains("[3,7]"))
    assert(run(Xdd.integerRange(_), "[-7,-3]").contains("[-7,-3]"))
    assert(run(Xdd.integerRange(_), "[7,3]").isEmpty)
    assert(run(Xdd.integerRange(_), "[1.5,2]").isEmpty)
  }

  test("decimalRange compares exactly, keeps components verbatim") {
    assert(run(Xdd.decimalRange(_), "[1.50,1.5]").contains("[1.50,1.5]"))
    assert(run(Xdd.decimalRange(_), "[2.01,2.001]").isEmpty)
  }

  test("ranges beyond long/decimal(38,18) compare lexically, not via null casts") {
    // 2^63 and 2^63+1: both overflow long — previously cast to null
    // and flagged a VALID range invalid
    assert(run(Xdd.integerRange(_), "[9223372036854775808,9223372036854775809]")
      .contains("[9223372036854775808,9223372036854775809]"))
    assert(run(Xdd.integerRange(_), "[9223372036854775809,9223372036854775808]").isEmpty)
    assert(run(Xdd.integerRange(_), "[-9223372036854775809,1]")
      .contains("[-9223372036854775809,1]"))
    assert(run(Xdd.integerRange(_), "[007,8]").contains("[007,8]"))
    assert(run(Xdd.integerRange(_), "[-0,0]").contains("[-0,0]"))
    assert(run(Xdd.integerRange(_), "[0,-0]").contains("[0,-0]"))
    val big40 = "9" * 40 // wider than decimal(38,18) precision
    assert(run(Xdd.decimalRange(_), s"[1.5,$big40.25]")
      .contains(s"[1.5,$big40.25]"))
    assert(run(Xdd.decimalRange(_), s"[$big40.25,1.5]").isEmpty)
    assert(run(Xdd.decimalRange(_), s"[-$big40.25,-1.5]")
      .contains(s"[-$big40.25,-1.5]"))
    assert(run(Xdd.decimalRange(_), s"[-1.5,-$big40.25]").isEmpty)
  }

  test("xsd:duration canonicalizes per XSD 1.0 and rejects bad lexicals") {
    import graft.functions.XsdDuration
    def dur(in: String) = run(XsdDuration.canonical(_), in)
    assert(dur("P14M").contains("P1Y2M"))
    assert(dur("P1Y13M").contains("P2Y1M"))
    assert(dur("PT90061S").contains("P1DT1H1M1S"))
    assert(dur("PT3600S").contains("PT1H"))
    assert(dur("P0Y0MT0S").contains("PT0S"))
    assert(dur("-P13MT61S").contains("-P1Y1MT1M1S"))
    assert(dur("PT5.250S").contains("PT5.25S"))
    assert(dur("PT0.5S").contains("PT0.5S"))
    assert(dur("PT5.0S").contains("PT5S"))
    assert(dur("P3DT2H").contains("P3DT2H"))
    assert(dur("P").isEmpty)        // nothing after P
    assert(dur("PT").isEmpty)       // lone T
    assert(dur("P1YT").isEmpty)     // T with no time component
    assert(dur("P-3M").isEmpty)     // negative component
    assert(dur("3M").isEmpty)
  }

  test("url and email validate") {
    assert(run(Xdd.url(_), " https://example.com/x?q=1 ")
      .contains("https://example.com/x?q=1"))
    assert(run(Xdd.url(_), "http://host:8080/p").contains("http://host:8080/p"))
    assert(run(Xdd.url(_), "ftp://example.com").isEmpty)
    assert(run(Xdd.email(_), "a.b+c@example.co").contains("a.b+c@example.co"))
    assert(run(Xdd.email(_), "not-an-email").isEmpty)
  }
}

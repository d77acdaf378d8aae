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

  test("url and email validate") {
    assert(run(Xdd.url(_), " https://example.com/x?q=1 ")
      .contains("https://example.com/x?q=1"))
    assert(run(Xdd.url(_), "http://host:8080/p").contains("http://host:8080/p"))
    assert(run(Xdd.url(_), "ftp://example.com").isEmpty)
    assert(run(Xdd.email(_), "a.b+c@example.co").contains("a.b+c@example.co"))
    assert(run(Xdd.email(_), "not-an-email").isEmpty)
  }
}

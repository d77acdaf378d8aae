package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Triangles

/** Round-11 operator units: basket lift (in-row pair enumeration)
  * against a brute-force pair scan, and its giant-basket guard. */
class Round11OpsSpec extends AnyFunSuite {
  import TestSpark._

  test("basket lift equals the brute pair computation") {
    import spark.implicits._
    // baskets: 1:{a,b,c} 2:{a,b} 3:{a,b} 4:{b,c} 5:{a} + dup rows
    val rows = Seq(
      (1L, 10L), (1L, 11L), (1L, 12L), (1L, 10L), // dup (1,a)
      (2L, 10L), (2L, 11L),
      (3L, 10L), (3L, 11L),
      (4L, 11L), (4L, 12L),
      (5L, 10L))
    val df = rows.toDF("bk", "it")
    val got = Triangles.basketLift(df, "bk", "it", minSupport = 2L, k = 10)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    // brute: n=5 baskets; n_a(10)=4, n_b(11)=4, n_c(12)=2;
    // pairs: (10,11) in baskets 1,2,3 → nab=3; (10,12) in 1 → below
    // support; (11,12) in 1,4 → nab=2
    assert(got.keySet == Set((10L, 11L), (11L, 12L)))
    val (nab1, lift1) = got((10L, 11L))
    assert(nab1 == 3L && lift1 == math.round(3.0 * 5 * 1000000L / (4.0 * 4)))
    val (nab2, lift2) = got((11L, 12L))
    assert(nab2 == 2L && lift2 == math.round(2.0 * 5 * 1000000L / (4.0 * 2)))
  }

  test("basket lift equals the brute model over random baskets") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    (1 to 5).foreach { trial =>
      val rows = Seq.fill(60)((rnd.nextInt(8).toLong + 1, rnd.nextInt(6).toLong + 10))
      val got = Triangles.basketLift(rows.toDF("bk", "it"), "bk", "it",
          minSupport = 2L, k = 1000)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
        .toMap
      // brute in Scala: distinct (bk, it), N baskets, per-item basket
      // counts, per-pair co-occurrence counts, micro-lift
      val b = rows.distinct
      val n = b.map(_._1).distinct.size
      val ni = b.groupBy(_._2).view.mapValues(_.map(_._1).distinct.size).toMap
      val byBk = b.groupBy(_._1).view.mapValues(_.map(_._2).distinct.sorted).toMap
      val nab = byBk.values.flatMap(items =>
          for (i <- items.indices; j <- i + 1 until items.size)
            yield (items(i), items(j)))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
        .filter(_._2 >= 2)
      val want = nab.map { case ((a, c), cnt) =>
        (a, c) -> ((cnt,
          math.round(cnt.toDouble * n * 1000000L / (ni(a).toDouble * ni(c)))))
      }
      assert(got == want, s"trial $trial: got $got want $want")
    }
  }

  test("ImageIoCodec decodes JDK-encoded JPEG and GIF byte streams") {
    import graft.llm.Multimodal
    def enc(fmt: String, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until h).foreach(y => (0 until w).foreach(x =>
        img.setRGB(x, y, (x * 31 + y) & 0xffffff)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.setUseCache(false)
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
      bos.toByteArray
    }
    assert(Multimodal.ImageIoCodec.decode(enc("jpg", 17, 9))
      == Some((17L, 9L, "image/jpeg")))
    assert(Multimodal.ImageIoCodec.decode(enc("gif", 5, 7))
      == Some((5L, 7L, "image/gif")))
  }

  test("basket lift refuses giant baskets when capped, passes under the cap") {
    import spark.implicits._
    val big = (1 to 50).map(i => (1L, i.toLong)) ++ Seq((2L, 1L), (2L, 2L))
    val df = big.toDF("bk", "it")
    val e = intercept[IllegalArgumentException] {
      Triangles.basketLift(df, "bk", "it", 1L, 5, maxBasketItems = 10).count()
    }
    assert(e.getMessage.contains("maxBasketItems"))
    // same data, cap high enough: computes normally
    assert(Triangles.basketLift(df, "bk", "it", 1L, 5,
      maxBasketItems = 64).count() > 0)
  }
}

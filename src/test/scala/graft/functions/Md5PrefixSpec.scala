package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class Md5PrefixSpec extends SparkSpec {
  import spark.implicits._

  test("digest-direct prefix equals the conv(substring(md5)) formulation") {
    val rng = new scala.util.Random(3)
    val rows = (1 to 300).map { i =>
      val s = i match {
        case 1 => ""
        case 2 => "héllo wörld ünïcode 漢字"
        case _ => rng.alphanumeric.take(rng.nextInt(30)).mkString
      }
      (i, s)
    }
    val df = rows.toDF("id", "s")
    val got = df.select($"id",
        Md5Prefix($"s", 8).as("fast32"),
        conv(substring(md5($"s"), 1, 8), 16, 10).cast("long").as("ref32"),
        Md5Prefix($"s", 15).as("fast60"),
        conv(substring(md5($"s"), 1, 15), 16, 10).cast("long").as("ref60"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"32-bit mismatch for id=${r.getInt(0)}")
      assert(r.getLong(3) == r.getLong(4), s"60-bit mismatch for id=${r.getInt(0)}")
    }
  }

  test("values are non-negative and within range") {
    val df = (1 to 50).map(i => s"v$i").toDF("s")
    val vals32 = df.select(Md5Prefix($"s", 8)).as[Long].collect()
    assert(vals32.forall(v => v >= 0 && v < (1L << 32)))
    val vals60 = df.select(Md5Prefix($"s", 15)).as[Long].collect()
    assert(vals60.forall(v => v >= 0 && v < (1L << 60)))
  }

  test("interpreted and codegen paths agree") {
    // force the interpreted path through a higher-order lambda, as the
    // minhash signature does
    val df = Seq((1, Seq("a", "b", "c"))).toDF("id", "toks")
    val viaLambda = df.select(
        transform($"toks", t => Md5Prefix(t, 8)).as("hs"))
      .as[Seq[Long]].head()
    val direct = Seq("a", "b", "c").toDF("s")
      .select(Md5Prefix($"s", 8)).as[Long].collect().toSeq
    assert(viaLambda == direct)
  }
}

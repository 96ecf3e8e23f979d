package graft

import org.apache.spark.sql.functions._

import graft.operators.Quantize

/** int8 quantization: hand-computed codes, zero-vector guard, the
  * reconstruction error bound, and the shuffle-free plan.
  */
class QuantizeSpec extends SparkSpec {

  import spark.implicits._

  test("codes are round(v * 127 / max|v|), scale is max|v|") {
    val d = Seq((1L, Seq(1.0f, -0.5f, 0.25f, 0.0f))).toDF("id", "v")
    val got = Quantize.int8(d, "id", "v")
      .select($"scale", $"q").as[(Double, Seq[Int])].collect().head
    assert(got._1 == 1.0)
    assert(got._2 == Seq(127, -64, 32, 0), got._2.toString) // -63.5 rounds away from zero
  }

  test("zero vectors quantize to zero codes with scale 0") {
    val d = Seq((1L, Seq(0.0f, 0.0f))).toDF("id", "v")
    val got = Quantize.int8(d, "id", "v")
      .select($"scale", $"q").as[(Double, Seq[Int])].collect().head
    assert(got == ((0.0, Seq(0, 0))))
  }

  test("dequantize(int8(v)) is within scale/254 per element (half a code step)") {
    val rnd = new scala.util.Random(11)
    val d = (1L to 50L).map(id => (id, Seq.fill(16)(rnd.nextFloat() * 2 - 1)))
      .toDF("id", "v")
    val joined = Quantize.dequantize(Quantize.int8(d, "id", "v"), "id")
      .join(d, "id")
      .select($"id", $"vec", $"v", array_max(transform($"v", x => abs(x.cast("double")))).as("s"))
      .as[(Long, Seq[Double], Seq[Float], Double)].collect()
    joined.foreach { case (id, deq, orig, s) =>
      orig.zip(deq).foreach { case (o, q) =>
        assert(math.abs(o.toDouble - q) <= s / 254.0 + 1e-12, s"id=$id")
      }
    }
  }

  test("quantization is scan-local: no exchange in the plan") {
    val d = Seq((1L, Seq(1.0f))).toDF("id", "v")
    val plan = Quantize.int8(d, "id", "v").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("codes fit int8: every code in [-127, 127]") {
    val rnd = new scala.util.Random(23)
    val d = (1L to 30L).map(id => (id, Seq.fill(8)(rnd.nextFloat() * 1000 - 500)))
      .toDF("id", "v")
    val codes = Quantize.int8(d, "id", "v")
      .select(explode($"q")).as[Int].collect()
    assert(codes.forall(c => c >= -127 && c <= 127))
  }
}

package graft

import graft.batch.{Evaluation, QuantileBounds}
import graft.monitor.ThresholdUpdate

/** Golden scenario 5 (FIXTURES.md §6): hand-computed RMSE & wQL over a
  * 5-point vector (evaluate.py:73-91); quantile-bound derivation both
  * variants; threshold feedback rule. */
class EvaluationSpec extends SparkSpec {
  import spark.implicits._

  // targets & "predictions" (mean and per-quantile all equal for simplicity)
  private val targets = Seq(10.0, 20.0, 30.0, 40.0, 50.0)
  private val preds = Seq(12.0, 18.0, 33.0, 35.0, 55.0)
  private lazy val df = targets.zip(preds).toDF("target", "pred")

  test("RMSE matches hand computation") {
    // errors: -2, 2, -3, 5, -5 → squares 4,4,9,25,25 → mean 13.4
    val expected = math.sqrt(13.4)
    assert(math.abs(Evaluation.rmse(df, "target", "pred") - expected) < 1e-12)
  }

  test("weighted quantile loss matches hand computation") {
    // pinball q=0.5: 0.5*|err| → 0.5*(2+2+3+5+5)=8.5
    // weight = 2/sum|target| = 2/150
    // wQL_0.5 = 8.5 * 2/150 = 0.11333...
    val (perQ, mean) = Evaluation.weightedQuantileLoss(df, "target", Seq(0.5 -> "pred"))
    assert(math.abs(perQ.head._2 - 8.5 * 2.0 / 150.0) < 1e-12)
    assert(math.abs(mean - perQ.head._2) < 1e-15)
    // q=0.05: under-pred err>0 gets 0.05*err, over-pred 0.95*(-err)
    // rows: t>p? {20>18:+2, 40>35:+5} → 0.05*(2+5)=0.35
    //       else {12-10=2, 33-30=3, 55-50=5} → 0.95*10=9.5 → total 9.85
    val (perQ2, _) = Evaluation.weightedQuantileLoss(df, "target", Seq(0.05 -> "pred"))
    assert(math.abs(perQ2.head._2 - 9.85 * 2.0 / 150.0) < 1e-12)
  }

  test("positional alignment zips by explicit order") {
    val t = Seq(("a", 1.0), ("b", 2.0), ("c", 3.0)).toDF("k", "target")
    val p = Seq(("z", 30.0), ("y", 20.0), ("x", 10.0)).toDF("k2", "prediction")
    val aligned = Evaluation.alignByPosition(t, "k", p, "k2")
      .select("target", "prediction").as[(Double, Double)].collect().toSet
    assert(aligned === Set((1.0, 10.0), (2.0, 20.0), (3.0, 30.0)))
  }

  test("quantile bounds: pipeline and monitoring variants") {
    assert(QuantileBounds.pipeline(90) === ((0.05, 0.95)))
    assert(QuantileBounds.pipeline(85) === ((0.075, 0.925)))
    assert(QuantileBounds.monitoring(90) === ((0.05, 0.95)))
    assert(QuantileBounds.monitoring(85) === ((0.05, 0.95)), "non-whitelisted falls back to 90")
    assert(QuantileBounds.monitoring(60) === ((0.2, 0.8)))
  }

  test("threshold update tightens only on improvement") {
    // wql 0.1 < threshold 0.24 → 0.1 + 0.14*0.5 = 0.17
    assert(math.abs(ThresholdUpdate.next(0.1, 0.24) - 0.17) < 1e-12)
    assert(ThresholdUpdate.next(0.3, 0.24) === 0.24)
  }
}

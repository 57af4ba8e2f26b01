package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Golden e2e: the reference's only correctness contract — its three fixture
  * CSVs (`/root/reference/src/test/resources/`) — must reproduce exactly.
  */
class BillingAlertsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fmt(o: AlertOutput) = s"${o.id},${o.alarmTriggerDatetime},${o.topupDatetime}"

  test("golden e2e: match + timeout outputs equal the reference fixtures") {
    val input = getClass.getResource("/input-data.csv").getPath
    val out = BillingAlerts.detect(BillingAlerts.readCsv(spark, input)).collect()

    val matches = out.filter(_.kind == "match").map(fmt).toSeq.sorted
    val timeouts = out.filter(_.kind == "timeout").map(fmt).toSeq.sorted

    // expected-output.csv:1
    assert(matches == Seq("2,2020-05-01 11:00:00,2020-05-01 11:40:00"))
    // expected-side-output.csv:1
    assert(timeouts == Seq("1,2020-05-01 11:00:00,"))
  }

  test("order-independence: shuffled input produces identical results") {
    import spark.implicits._
    val input = getClass.getResource("/input-data.csv").getPath
    val lines = scala.io.Source.fromFile(input).getLines().toSeq
    val shuffled = new scala.util.Random(7).shuffle(lines)
    val ds = spark.createDataset(shuffled).map(graft.events.BillingEvent.parse)
    val out = BillingAlerts.detect(ds).collect()
    assert(out.filter(_.kind == "match").map(fmt).toSeq ==
      Seq("2,2020-05-01 11:00:00,2020-05-01 11:40:00"))
    assert(out.filter(_.kind == "timeout").map(fmt).toSeq ==
      Seq("1,2020-05-01 11:00:00,"))
  }
}

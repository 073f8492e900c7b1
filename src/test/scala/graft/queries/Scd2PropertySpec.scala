package graft.queries

import graft.SparkTestBase
import org.scalacheck.{Gen, Prop, Test => ScTest}

/** Property test for the SCD2 interval derivation: ANY random event
  * sequence (duplicate timestamps across keys, deletes anywhere,
  * arbitrary arrival order) intervalizes to exactly what a naive
  * per-key sorted replay produces — the history-table counterpart of
  * MergeSpec's compact-vs-HashMap property.
  */
case class HEv(key: Long, value: String, op: String, ts: Long, seq: Long)

class Scd2PropertySpec extends SparkTestBase {
  import spark.implicits._

  private def replay(evs: Seq[HEv])
      : Set[(Long, String, Long, Option[Long], Boolean)] =
    evs.groupBy(_.key).flatMap { case (k, kevs) =>
      val ordered = kevs.sortBy(e => (e.ts, e.seq))
      ordered.zipWithIndex.collect {
        case (e, i) if e.op != "d" =>
          val next = ordered.lift(i + 1).map(_.ts)
          (k, e.value, e.ts, next, next.isEmpty)
      }
    }.toSet

  private val genEvents: Gen[List[HEv]] = for {
    n <- Gen.chooseNum(1, 50)
    evs <- Gen.listOfN(n, for {
      k <- Gen.chooseNum(0L, 7L)
      v <- Gen.alphaStr.map(_.take(5))
      op <- Gen.oneOf("c", "u", "d", "r")
      ts <- Gen.chooseNum(0L, 6L)
    } yield HEv(k, v, op, ts, 0L))
  } yield evs.zipWithIndex.map { case (e, i) => e.copy(seq = i.toLong) }

  test("intervalize == naive per-key sorted replay for random events") {
    val prop = Prop.forAll(genEvents) { evs =>
      val got = MaintenanceQueries
        .intervalize(evs.toDF(), "key")
        .collect().map { r =>
          (r.getLong(0), r.getString(1), r.getLong(3),
            if (r.isNullAt(2)) None else Some(r.getLong(2)),
            r.getBoolean(4))
        }.toSet
      got == replay(evs)
    }
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }
}

package graft.cdc

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => ScTest}

/** Property test for the A12 merge operator: any random op sequence
  * compacts to exactly what a naive per-key HashMap replay produces —
  * the property-based replacement for the reference's random-insert
  * smoke test (test_cdc.py:55-73).
  */
case class Ev(key: Long, value: String, op: String, ts: Long, seq: Long)

class MergeSpec extends SparkTestBase {
  import spark.implicits._

  private def toEnvelope(evs: Seq[Ev]) = {
    val df = evs.toDF()
    df.select(
      when($"op" === "d",
        struct($"key", $"value")).otherwise(lit(null)).as("before"),
      when($"op" =!= "d",
        struct($"key", $"value")).otherwise(lit(null)).as("after"),
      $"op", $"ts".as("ts_ms"), $"seq",
      struct(lit("commerce").as("schema"), lit("t").as("table")).as("source"))
  }

  private def replay(evs: Seq[Ev]): Map[Long, String] = {
    val m = scala.collection.mutable.LinkedHashMap.empty[Long, String]
    evs.sortBy(e => (e.ts, e.seq)).foreach { e =>
      if (e.op == "d") m.remove(e.key) else m(e.key) = e.value
    }
    m.toMap
  }

  private val genEvents: Gen[List[Ev]] = for {
    n <- Gen.chooseNum(0, 60)
    evs <- Gen.listOfN(n, for {
      k <- Gen.chooseNum(0L, 9L)
      v <- Gen.alphaStr.map(_.take(6))
      op <- Gen.oneOf("c", "u", "d", "r")
      ts <- Gen.chooseNum(0L, 5L)
    } yield Ev(k, v, op, ts, 0L))
  } yield evs.zipWithIndex.map { case (e, i) => e.copy(seq = i.toLong) }

  test("compact == naive HashMap replay for random op sequences") {
    val prop = Prop.forAll(genEvents) { evs =>
      val got =
        if (evs.isEmpty) Map.empty[Long, String]
        else Merge.compact(Envelope.flatten(toEnvelope(evs)), Seq("key"))
          .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      got == replay(evs)
    }
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("compact honors composite keys: cells merge independently") {
    val df = Seq(
      (1L, 1L, "a", "r", 1000L, 1L),
      (1L, 2L, "b", "r", 1000L, 2L),
      (2L, 1L, "c", "r", 1000L, 3L),
      (1L, 2L, "B", "u", 2000L, 4L),
      (2L, 1L, "x", "d", 3000L, 5L)
    ).toDF("k1", "k2", "v", "op", "ts", "seq")
    val env = df.select(
      when($"op" === "d", struct($"k1", $"k2", $"v")).otherwise(lit(null))
        .as("before"),
      when($"op" =!= "d", struct($"k1", $"k2", $"v")).otherwise(lit(null))
        .as("after"),
      $"op", $"ts".as("ts_ms"), $"seq",
      struct(lit("commerce").as("schema"), lit("t").as("table")).as("source"))
    val got = Merge.compact(Envelope.flatten(env), Seq("k1", "k2"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2))
      .toMap
    // (1,2) takes its update, (1,1) keeps the snapshot image even though
    // it shares k1 with an updated cell and k2 with a deleted one, and
    // the deleted (2,1) is gone.
    assert(got == Map((1L, 1L) -> "a", (1L, 2L) -> "B"))
  }

  test("stale events lose regardless of arrival order") {
    val evs = Seq(
      Ev(1, "new", "u", 10, 0), Ev(1, "stale", "u", 5, 1),
      Ev(2, "only", "c", 1, 2),
      Ev(3, "gone", "c", 1, 3), Ev(3, "x", "d", 2, 4))
    val got = Merge.compact(Envelope.flatten(toEnvelope(evs)), Seq("key"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "new", 2L -> "only"))
  }

  test("mergeIntoState upserts and deletes against existing state") {
    val state = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("key", "value")
    val evs = Seq(
      Ev(2, "b2", "u", 1, 0),   // update existing
      Ev(3, "x", "d", 1, 1),    // delete existing
      Ev(4, "d4", "c", 1, 2),   // insert new
      Ev(4, "d5", "u", 2, 3))   // then update it in the same batch
    val batch = Merge.compactKeepTombstones(
      Envelope.flatten(toEnvelope(evs)), Seq("key"))
    val got = Merge.mergeIntoState(state, batch, Seq("key"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "a", 2L -> "b2", 4L -> "d5"))
  }

  private def toBatchMeta(evs: Seq[Ev]) =
    Merge.compactKeepTombstones(Envelope.flatten(toEnvelope(evs)), Seq("key"))
      .select(col("row.*"),
        col("_cdc.ts_ms").as(StateStore.TsCol),
        col("_cdc.seq").as(StateStore.SeqCol),
        (col("_cdc.op") === Envelope.OpDelete).as(StateStore.DeletedCol))

  test("mergeOrdered is invariant to micro-batch slicing AND batch order") {
    val gen = for {
      evs <- genEvents.suchThat(_.nonEmpty)
      cuts <- Gen.listOfN(2, Gen.chooseNum(0, evs.length))
      shuffleSeed <- Gen.chooseNum(0L, 1000L)
    } yield (evs, cuts.sorted, shuffleSeed)
    val prop = Prop.forAll(gen) { case (evs, cuts, seed) =>
      val slices = (0 +: cuts :+ evs.length).distinct.sliding(2)
        .map { case Seq(a, b) => evs.slice(a, b) }.filter(_.nonEmpty).toSeq
      val shuffled = new scala.util.Random(seed).shuffle(slices)
      val finalState = shuffled.map(toBatchMeta)
        .reduce((s, b) => Merge.mergeOrdered(s, b, Seq("key")))
      val got = finalState.filter(!col(StateStore.DeletedCol))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      got == replay(evs)
    }
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("schema evolution widens INT to long and adds new columns") {
    assert(SchemaEvolution.widen(IntegerType, LongType) == LongType)
    assert(SchemaEvolution.widen(IntegerType, DoubleType) == DoubleType)
    assert(SchemaEvolution.widen(FloatType, LongType) == DoubleType)
    val state = Seq((1, "a")).toDF("key", "value")
    val batch = Seq((2L, "b", 3.5)).toDF("key", "value", "extra")
    val aligned = SchemaEvolution.align(state, batch)
    assert(aligned.schema("key").dataType == LongType)
    assert(aligned.columns.toSeq == Seq("key", "value", "extra"))
  }

  test("routing target expression substitutes schema and table") {
    val df = toEnvelope(Seq(Ev(1, "v", "c", 1, 0)))
    val t = df.select(
      Routing.targetExpr("cdc.{schema}_{table}").as("t")).head().getString(0)
    assert(t == "cdc.commerce_t")
  }
}

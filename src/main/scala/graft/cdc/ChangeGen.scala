package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Debezium-shaped change-log generator over a fixture
  * table — the engine's test input, mirroring the reference's
  * random-insert smoke pattern (reference: test_cdc.py:55-73) but seeded
  * and SQL-expressible so the DuckDB oracle can reproduce the expected
  * merged state from the base table alone.
  *
  * Event script over a base table with numeric PK `pk` and mutable
  * numeric column `mut` (all ops carry full row images, like Debezium
  * with a complete capture instance):
  *
  *   ts_ms=500  seq=pk  op='u'  STALE update (mut = -999) for pk%2==0 —
  *                              arrives before the snapshot; latest-wins
  *                              must discard it.
  *   ts_ms=1000 seq=pk  op='r'  snapshot read of every row (A1,
  *                              snapshot.mode=initial,
  *                              connect-sqlserver-source.json:14).
  *   ts_ms=2000 seq=pk  op='u'  mut += 100 for pk%3==0.
  *   ts_ms=3000 seq=pk  op='u'  mut += 200 for pk%5==0 (overrides the
  *                              ts=2000 update where both apply).
  *   ts_ms=4000 seq=pk  op='d'  delete for pk%7==0 (after=null,
  *                              before=base image — NOT the latest
  *                              image; envelopeRoute's oracle depends
  *                              on exactly this).
  *
  * Expected merged state (the oracle): rows with pk%7!=0, with
  * mut = base + (pk%5==0 ? 200 : pk%3==0 ? 100 : 0).
  */
object ChangeGen {

  /** Build the change log for one table. Returns envelope-schema rows
    * (before, after, op, ts_ms, seq, source), unioned in a deliberately
    * interleaved order so nothing downstream can rely on input order.
    */
  def changeLog(base: DataFrame, pk: String, mut: String,
                schemaName: String, tableName: String): DataFrame = {
    val cols = base.columns
    val src = struct(lit(schemaName).as("schema"), lit(tableName).as("table"))
    // Cast the mutable column to the BASE column's own type (not an
    // unconditional double) so the generated log's schema never diverges
    // from the oracle's view of the fixture table.
    val mutType = base.schema(mut).dataType
    def image(mutValue: Column): Column =
      struct(cols.map(c => if (c == mut) mutValue.cast(mutType).as(c)
                           else col(c)): _*)
    // Update deltas: when the mutable column is DECIMAL, add the delta
    // AS a decimal literal of the column's own type — decimal+decimal
    // arithmetic is exact, so no double ever enters the decimal path
    // and no engine-level double->decimal rounding can split the state
    // from the oracle (the round-9 cdc_decimal_widening hash flake).
    // Non-decimal columns keep the original double delta.
    def plusDelta(delta: Int): Column = mutType match {
      case _: org.apache.spark.sql.types.DecimalType =>
        col(mut) + lit(delta).cast(mutType)
      case _ => col(mut) + lit(delta.toDouble)
    }
    val baseImage = image(col(mut))
    // Typed NULL of the row-struct type without touching unresolved
    // dataType: a never-true CASE yields NULL with the branch's type.
    val nullImage = when(lit(false), baseImage)
    val pkCol = col(pk).cast("long")

    def ev(filter: Column, before: Column, after: Column, op: String,
           ts: Long): DataFrame =
      base.filter(filter).select(
        before.as("before"), after.as("after"), lit(op).as("op"),
        lit(ts).as("ts_ms"), pkCol.as("seq"), src.as("source"))

    val stale = ev(pkCol % 2 === 0, baseImage, image(lit(-999.0)),
      Envelope.OpUpdate, 500L)
    val snap = ev(lit(true), nullImage, baseImage, Envelope.OpRead, 1000L)
    val u1 = ev(pkCol % 3 === 0, baseImage, image(plusDelta(100)),
      Envelope.OpUpdate, 2000L)
    val u2 = ev(pkCol % 5 === 0, baseImage, image(plusDelta(200)),
      Envelope.OpUpdate, 3000L)
    val del = ev(pkCol % 7 === 0, baseImage, nullImage,
      Envelope.OpDelete, 4000L)

    // Interleave out of commit order on purpose.
    u2.unionAll(stale).unionAll(del).unionAll(snap).unionAll(u1)
  }

  /** [[changeLog]] with the PK cast to INT in every image — the
    * "before widening" shape of the reference's INT IDENTITY sources
    * (sqlserver/init.sql:10,15), used to drive the A11 INT→long
    * widening path end to end.
    */
  def changeLogIntPk(base: DataFrame, pk: String, mut: String,
                     schemaName: String, tableName: String): DataFrame = {
    val narrowed = base.withColumn(pk, col(pk).cast("int"))
    changeLog(narrowed, pk, mut, schemaName, tableName)
  }

  /** Schema-evolved follow-up log: one `op='u'` wave at ts_ms=5000 for
    * pk%11==0 whose row images carry (a) the PK at LONG (the sink's
    * declared widened type, connect-iceberg-sink.json:31,33) and (b) a
    * NEW column `<mut>_note = 'n-<pk>'`, with the mutable column set to
    * base+1000. Merged after [[changeLogIntPk]], the state must widen
    * the PK INT→long and null-backfill the new column — the reference's
    * evolve-schema semantics (connect-iceberg-sink.json:16).
    *
    * Note ts=5000 > the delete wave (ts=4000): keys satisfying both
    * pk%7==0 and pk%11==0 are deliberately resurrected — latest-wins
    * must apply across the schema boundary too.
    */
  def evolvedChangeLog(base: DataFrame, pk: String, mut: String,
                       schemaName: String, tableName: String): DataFrame = {
    val mutType = base.schema(mut).dataType
    val src = struct(lit(schemaName).as("schema"), lit(tableName).as("table"))
    val pkCol = col(pk).cast("long")
    val noteCol = concat(lit("n-"), pkCol.cast("string")).as("note")
    val cols = base.columns
    def image(noted: Boolean): Column = {
      val core = cols.map {
        case c if c == pk => pkCol.as(c)
        case c if c == mut => (col(mut) + 1000.0).cast(mutType).as(c)
        case c => col(c)
      }
      struct((core :+ (if (noted) noteCol
                       else lit(null).cast("string").as("note"))): _*)
    }
    base.filter(pkCol % 11 === 0).select(
      image(noted = false).as("before"),
      image(noted = true).as("after"),
      lit(Envelope.OpUpdate).as("op"),
      lit(5000L).as("ts_ms"), pkCol.as("seq"), src.as("source"))
  }

  /** DuckDB oracle SQL for the merged state of [[changeLog]] applied to
    * `table`: the `mut` column gets ROUND(.., 2) to keep double compare
    * stable (the Spark side rounds identically).
    */
  def mergedOracleSql(table: String, pk: String, mut: String,
                      otherCols: Seq[String]): String = {
    val mutExpr = s"ROUND($mut + CASE WHEN $pk % 5 = 0 THEN 200.0 " +
      s"WHEN $pk % 3 = 0 THEN 100.0 ELSE 0.0 END, 2) AS $mut"
    val cols = (Seq(pk) ++ otherCols).map(c => if (c == mut) mutExpr else c)
    s"SELECT ${cols.mkString(", ")} FROM $table WHERE $pk % 7 <> 0 ORDER BY $pk"
  }
}

package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Structural properties of the chunker that the value-hash oracle
  * can't state directly: full coverage (every word of every document
  * appears in at least one chunk) and exact reconstruction (the first
  * `stride` words of each chunk, plus the final chunk's tail,
  * concatenate back to the original text) — together they prove the
  * window/stride arithmetic loses nothing and duplicates nothing
  * beyond the designed overlap.
  */
class ChunkSpec extends SparkTestBase {
  import spark.implicits._

  private val (win, stride) = (32, 24)

  test("chunks reconstruct every document exactly") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    val rebuilt = LlmOps.chunkOverlap(spark, sf)
      .select($"doc_id", $"chunk_id", $"chunk", $"n_words")
      .as[(Long, Int, String, Int)].collect()
      .groupBy(_._1).map { case (docId, rows) =>
        val ordered = rows.sortBy(_._2)
        val words = ordered.flatMap { case (_, id, chunk, _) =>
          val w = chunk.split(" ", -1)
          // Non-final chunks contribute their first `stride` words
          // (the rest is the next chunk's overlap); the final chunk
          // contributes everything.
          if (id == ordered.last._2) w else w.take(stride)
        }
        docId -> words.mkString(" ")
      }
    assert(rebuilt.keySet === docs.keySet)
    rebuilt.foreach { case (docId, text) =>
      assert(text === docs(docId), s"doc $docId reconstruction differs")
    }
  }

  test("chunk word counts cover each document with designed overlap") {
    val stats = LlmOps.chunkOverlap(spark, sf)
      .groupBy("doc_id")
      .agg(sum("n_words").as("chunk_words"), count(lit(1)).as("n_chunks"))
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", size(split($"text", " ")).as("doc_words"))
    val bad = stats.join(docs, Seq("doc_id"))
      // total chunk words = doc words + overlap words duplicated:
      // (n_chunks - 1) overlaps of (win - stride), except the final
      // chunk may be shorter than the overlap — so bound both sides.
      .filter(col("chunk_words") < col("doc_words") ||
        col("chunk_words") > col("doc_words") +
          (col("n_chunks") - 1) * (win - stride))
      .count()
    assert(bad === 0L)
  }
}

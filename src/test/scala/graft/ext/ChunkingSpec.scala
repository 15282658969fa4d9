package graft.ext

import graft.SparkSpecBase

class ChunkingSpec extends SparkSpecBase {
  import spark.implicits._

  private def chunksOf(text: String, chunkSize: Int, stride: Int) =
    Chunking.chunkTokens(Seq((1L, text)).toDF("doc_id", "text"),
        chunkSize, stride)
      .as[(Long, Long, Long, Long, String)].collect().toSeq.sortBy(_._2)

  test("short document yields exactly one chunk") {
    val out = chunksOf("a b c", chunkSize = 32, stride = 24)
    assert(out == Seq((1L, 0L, 0L, 3L, "a b c")))
  }

  test("doc exactly chunkSize long yields one chunk") {
    val text = (1 to 32).map("t" + _).mkString(" ")
    val out = chunksOf(text, 32, 24)
    assert(out.size == 1 && out.head._4 == 32L)
  }

  test("windows advance by stride and overlap by chunkSize - stride") {
    val text = (1 to 40).map("t" + _).mkString(" ")
    val out = chunksOf(text, 32, 24)
    assert(out.map(c => (c._2, c._3, c._4)) == Seq((0L, 0L, 32L), (1L, 24L, 16L)))
    // overlap: chunk 1 re-covers tokens 25..32 then adds 33..40
    assert(out(1)._5.startsWith("t25 ") && out(1)._5.endsWith(" t40"))
  }

  test("a fully-contained suffix window is not emitted") {
    // n=30 < chunkSize: a second window at start=24 would add no new token
    val text = (1 to 30).map("t" + _).mkString(" ")
    assert(chunksOf(text, 32, 24).size == 1)
    // n=33: token 33 is unseen, so the second window IS emitted
    val text2 = (1 to 33).map("t" + _).mkString(" ")
    val out2 = chunksOf(text2, 32, 24)
    assert(out2.size == 2 && out2(1)._4 == 9L)
  }

  test("zero-token documents yield no chunks; stride validation") {
    val df = Seq((1L, ""), (2L, "  ")).toDF("doc_id", "text")
    assert(Chunking.chunkTokens(df, 32, 24).count() == 0L)
    intercept[IllegalArgumentException] {
      Chunking.chunkTokens(df, 32, 33)
    }
    intercept[IllegalArgumentException] {
      Chunking.chunkTokens(df, 0, 1)
    }
  }

  test("chunking is stateless, so it streams: per-batch output equals batch output") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val chunked = Chunking.chunkTokens(input.toDF().toDF("doc_id", "text"), 4, 3)
    val q = chunked.writeStream.format("memory").queryName("chunk_stream")
      .outputMode("append").start()
    try {
      input.addData((1L, (1 to 10).map("t" + _).mkString(" ")))
      q.processAllAvailable()
      input.addData((2L, "a b c"))
      q.processAllAvailable()
      val streamed = spark.sql(
          "SELECT doc_id, chunk_idx, chunk_text FROM chunk_stream")
        .as[(Long, Long, String)].collect().toSet
      val batch = Chunking.chunkTokens(
          Seq((1L, (1 to 10).map("t" + _).mkString(" ")), (2L, "a b c"))
            .toDF("doc_id", "text"), 4, 3)
        .select("doc_id", "chunk_idx", "chunk_text")
        .as[(Long, Long, String)].collect().toSet
      assert(streamed == batch && streamed.nonEmpty)
    } finally q.stop()
  }

  test("non-overlapping chunking (stride == chunkSize) partitions the tokens") {
    val text = (1 to 10).map("t" + _).mkString(" ")
    val out = chunksOf(text, 4, 4)
    assert(out.map(_._4) == Seq(4L, 4L, 2L))
    assert(out.flatMap(_._5.split(" ")).toSeq == (1 to 10).map("t" + _))
  }
}

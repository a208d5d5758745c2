package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.nio.file.attribute.FileTime
import org.apache.spark.sql.functions._
import graft.streaming.{EventStream, NearDupStream}

/** Stream-batch parity for the streaming near-dup filter: on a bounded
  * replay in doc_id order, the greedy keep-first kept set must equal the
  * batch rule "drop b iff simHashNearDups emits some pair (a, b)". */
class NearDupStreamSpec extends SparkSpec {

  private val replayDir = "/tmp/graft-neardup-replay"

  /** Write docs as three single-file batches (thirds by doc_id) with
    * strictly increasing mod times, so the file source replays them as
    * three ordered micro-batches under maxFilesPerTrigger=1. */
  private def writeReplay(): (Long, org.apache.spark.sql.types.StructType) = {
    val docs = Catalog.load(spark, sf0001, "documents")
    val n = docs.count()
    new java.io.File(replayDir).mkdirs()
    new java.io.File(replayDir).listFiles().foreach(_.delete())
    val t0 = System.currentTimeMillis()
    (0 until 3).foreach { i =>
      val lo = n * i / 3
      val hi = if (i == 2) n else n * (i + 1) / 3
      val tmp = s"$replayDir-tmp$i"
      docs.where(col("doc_id") >= lo && col("doc_id") < hi)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = Paths.get(replayDir, s"d$i.parquet")
      Files.copy(part.toPath, dest, StandardCopyOption.REPLACE_EXISTING)
      // 10s apart: file-source ordering is by modification time
      Files.setLastModifiedTime(dest, FileTime.fromMillis(t0 + i * 10000L))
    }
    (n, docs.schema)
  }

  test("streaming near-dup flags == batch greedy keep-first over 3 micro-batches") {
    val (n, schema) = writeReplay()
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "*.parquet")
      .parquet(replayDir)
    EventStream.drainToMemory(spark,
      NearDupStream.nearDupFlags(stream, maxHamming = 6), "nds", "append")
    val got = spark.table("nds")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap

    val docs = Catalog.load(spark, sf0001, "documents")
    val pairs = llm.Dedup.simHashNearDups(docs, maxHamming = 6)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "corpus precondition: some near-dup pairs exist")
    // state must carry across micro-batches: at least one pair straddles
    // the first batch boundary (partner arrived in an earlier file)
    assert(pairs.exists { case (a, b) => a < n / 3 && b >= n / 3 },
      "corpus precondition: a near-dup pair must straddle micro-batches")

    val dropSet = pairs.map(_._2).toSet
    assert(got.size == n, "one verdict per doc")
    val mismatches = got.filter { case (id, dup) => dup != dropSet(id) }
    assert(mismatches.isEmpty,
      s"stream flags must equal batch greedy keep-first; diff: $mismatches")
  }

  test("streaming multimodal near-dup flags == batch perceptual pairs (greedy keep-first)") {
    // the r13 multimodal front through the SAME generic bucket-state
    // core: a bounded vec_id-ordered replay of the embeddings grid
    // vectors, flagged by 64-bit perceptual aHash — verdicts must equal
    // the batch rule "v is a dup iff perceptualNearDups(bits=64) emits
    // some pair (a, v) with a < v" (every arrival's signature enters
    // state whether kept or dropped, so the pair list decides exactly).
    import graft.multimodal.Multimodal
    val dir = "/tmp/graft-phash-replay"
    val vecs = Catalog.load(spark, sf0001, "embeddings")
    val n = vecs.count()
    new java.io.File(dir).mkdirs()
    new java.io.File(dir).listFiles().foreach(_.delete())
    val t0 = System.currentTimeMillis()
    (0 until 3).foreach { i =>
      val lo = n * i / 3
      val hi = if (i == 2) n else n * (i + 1) / 3
      val tmp = s"$dir-tmp$i"
      vecs.where(col("vec_id") >= lo && col("vec_id") < hi)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = Paths.get(dir, s"v$i.parquet")
      Files.copy(part.toPath, dest, StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(dest, FileTime.fromMillis(t0 + i * 10000L))
    }
    val stream = spark.readStream.schema(vecs.schema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "*.parquet")
      .parquet(dir)
      .select(col("vec_id").as("media_id"), col("embedding"))
    EventStream.drainToMemory(spark,
      NearDupStream.phashNearDupFlags(stream, maxHamming = 15), "pnds", "append")
    val got = spark.table("pnds")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap

    val pairs = Multimodal.perceptualNearDups(vecs, "vec_id", "embedding",
        maxHamming = 15, bits = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "corpus precondition: some perceptual pairs exist")
    // state must carry across micro-batches: some pair's endpoints
    // arrive in different files (any boundary, not necessarily the first)
    def fileOf(id: Long): Long = math.min(2L, id * 3 / n)
    assert(pairs.exists { case (a, b) => fileOf(a) != fileOf(b) },
      "corpus precondition: a pair must straddle micro-batches")
    val dropSet = pairs.map(_._2).toSet
    assert(got.size == n, "one verdict per image")
    val mismatches = got.filter { case (id, dup) => dup != dropSet(id) }
    assert(mismatches.isEmpty,
      s"stream flags must equal batch greedy keep-first; diff: $mismatches")
  }

  test("maxPerBucket=0 disables memory, flags nothing") {
    // degenerate eviction bound: with no retained signatures every doc is
    // kept — the knob trades exactness for a hard state cap, and its
    // worst case must fail open (keep), never drop
    val (_, schema) = writeReplay()
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "*.parquet")
      .parquet(replayDir)
    EventStream.drainToMemory(spark,
      NearDupStream.nearDupFlags(stream, maxHamming = 6, maxPerBucket = 0),
      "nds0", "append")
    assert(spark.table("nds0").where(col("is_dup")).isEmpty)
  }
}

package graft

import java.nio.file.Files
import graft.streaming.Loader

/** L2 load unit: per-chunk checkpoints, resume skipping, and the
  * crash-mid-chunk rewrite contract (no marker → invisible → rewritten). */
class LoaderSpec extends SparkSpec {
  import spark.implicits._

  test("resume loads only unfinished chunks; partial chunk is invisible then rewritten") {
    val dir = Files.createTempDirectory("graft_loader").toString
    val src = (0L until 400L).map(k => (k, k * 2)).toDF("k", "v")
    val p1 = Loader.loadChunks(spark, src, "k", nChunks = 4, destDir = dir,
      completeAtMost = 2, partialNext = true)
    assert(p1 == Seq(0, 1))
    assert(Loader.loadedChunks(dir, 4) == Seq(0, 1))
    // the partial chunk 2 has data on disk but no marker → not readable
    val visible = Loader.readLoaded(spark, dir, 4)
    assert(visible.select("_chunk").distinct().as[Int].collect().sorted
      .toSeq == Seq(0, 1))
    val p2 = Loader.loadChunks(spark, src, "k", nChunks = 4, destDir = dir)
    assert(p2 == Seq(2, 3))
    val all = Loader.readLoaded(spark, dir, 4)
    assert(all.count() == 400) // the partial write never double-loads
    assert(all.select("k").distinct().count() == 400)
    // a third pass has nothing to do
    assert(Loader.loadChunks(spark, src, "k", nChunks = 4, destDir = dir).isEmpty)
  }
}

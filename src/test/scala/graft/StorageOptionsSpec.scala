package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StorageOptions
import graft.streaming.StorageOptions._

/** pkg/sink/cloudstorage/config.go: three repair semantics side by side —
  * error/clamp (worker-count), parse-error/two-way clamp (flush-interval),
  * clamp-only (file-size), silent reset-to-default (index width /
  * flush concurrency) — plus a randomized replay. */
class StorageOptionsSpec extends AnyFunSuite {

  private def ok(r: Either[(String, String), Adjusted]): Adjusted =
    r.toOption.getOrElse(fail(s"expected Right, got $r"))

  test("worker-count errors at zero, clamps above 512") {
    assert(StorageOptions(Map.empty, Map("worker-count" -> "0")).isLeft)
    assert(ok(StorageOptions(Map.empty, Map("worker-count" -> "600")))
      .options.workerCount == 512)
  }

  test("flush-interval: parse error is fatal, range repairs are clamps") {
    assert(StorageOptions(Map.empty, Map("flush-interval" -> "soon")).isLeft)
    assert(ok(StorageOptions(Map.empty, Map("flush-interval" -> "500ms")))
      .options.flushIntervalMs == 2000L)
    assert(ok(StorageOptions(Map.empty, Map("flush-interval" -> "1h")))
      .options.flushIntervalMs == 600000L)
    // empty string silently ignored (len guard before the parse)
    val e = ok(StorageOptions(Map.empty, Map("flush-interval" -> "")))
    assert(e.options.flushIntervalMs == 5000L && e.warnings.isEmpty)
  }

  test("file-size has NO error leg — zero and negatives clamp UP") {
    assert(ok(StorageOptions(Map.empty, Map("file-size" -> "0")))
      .options.fileSize == MinFileSize)
    assert(ok(StorageOptions(Map.empty, Map("file-size" -> "-5")))
      .options.fileSize == MinFileSize)
    assert(ok(StorageOptions(Map.empty, Map("file-size" -> "999999999")))
      .options.fileSize == MaxFileSize)
  }

  test("index width and flush concurrency silently reset to defaults") {
    val a = ok(StorageOptions(Map.empty, Map.empty,
      fileIndexWidth = Some(25), flushConcurrency = Some(513)))
    assert(a.options.fileIndexWidth == 20 && a.options.flushConcurrency == 1)
    assert(a.warnings.isEmpty) // reset is SILENT — no warn, unlike clamps
    val b = ok(StorageOptions(Map.empty, Map.empty,
      fileIndexWidth = Some(6), flushConcurrency = Some(512)))
    assert(b.options.fileIndexWidth == 6 && b.options.flushConcurrency == 512)
  }

  test("scheme gate covers the reference's seven storage schemes") {
    for (s <- Seq("file", "s3", "gcs", "gs", "azblob", "azure", "noop"))
      assert(fromUri(s"$s://x/y").isRight, s)
    assert(fromUri("kafka://h/t").isLeft)
  }

  test("adjust equals a flat replay (300 random tuples)") {
    val rnd = new scala.util.Random(1306L)
    for (trial <- 0 until 300) {
      val params = scala.collection.mutable.Map.empty[String, String]
      val wc = rnd.nextInt(4) match {
        case 0 => 0
        case 1 => 1 + rnd.nextInt(511)
        case 2 => 513 + rnd.nextInt(1000)
        case _ => Int.MinValue
      }
      if (wc != Int.MinValue) params("worker-count") = wc.toString
      val fiSec = rnd.nextInt(4) match {
        case 0 => rnd.nextInt(2) // below min (0s, 1s)
        case 1 => 2 + rnd.nextInt(598)
        case 2 => 601 + rnd.nextInt(1000)
        case _ => Int.MinValue
      }
      if (fiSec != Int.MinValue) params("flush-interval") = s"${fiSec}s"
      val fs = rnd.nextInt(4) match {
        case 0 => rnd.nextInt(1048576) // below min
        case 1 => 1048576 + rnd.nextInt(535822337)
        case 2 => 536870913 + rnd.nextInt(1000000)
        case _ => Int.MinValue
      }
      if (fs != Int.MinValue) params("file-size") = fs.toString
      val expErr = wc != Int.MinValue && wc <= 0
      (StorageOptions(Map.empty, params.toMap), expErr) match {
        case (Left((e, _)), true) => assert(e == ErrInvalidConfig)
        case (Right(a), false) =>
          val expWc = if (wc == Int.MinValue) 16 else math.min(wc, 512)
          val expFi = if (fiSec == Int.MinValue) 5000L
            else math.max(2000L, math.min(600000L, fiSec * 1000L))
          val expFs = if (fs == Int.MinValue) 67108864
            else math.max(1048576, math.min(536870912, fs))
          assert(a.options.workerCount == expWc, s"trial $trial")
          assert(a.options.flushIntervalMs == expFi, s"trial $trial")
          assert(a.options.fileSize == expFs, s"trial $trial")
          val wantWarns =
            (if (wc != Int.MinValue && wc > 512) Set("worker-count-capped")
             else Set.empty[String]) ++
            (if (fiSec != Int.MinValue && fiSec * 1000L > 600000L)
               Set("flush-interval-capped")
             else if (fiSec != Int.MinValue && fiSec * 1000L < 2000L)
               Set("flush-interval-raised") else Set.empty[String]) ++
            (if (fs != Int.MinValue && fs > 536870912) Set("file-size-capped")
             else if (fs != Int.MinValue && fs < 1048576)
               Set("file-size-raised") else Set.empty[String])
          assert(a.warnings.toSet == wantWarns, s"trial $trial $params")
        case (got, exp) => fail(s"trial $trial: got $got, expErr $exp")
      }
    }
  }
}

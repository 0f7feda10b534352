package graft

import org.apache.spark.sql.functions._
import graft.core.ChangeGen
import graft.operators.{Compaction, Transforms}

/** ChangeGen streams across parameter settings: compaction must equal
  * naive replay regardless of mix (FIXTURES.md §2.1 oracle). */
class ChangeGenSpec extends SparkSpec {
  import spark.implicits._

  for (cfg <- Seq(
      ChangeGen.Config(seed = 1, n = 500, updatePct = 30, deletePct = 10, churnPct = 10),
      ChangeGen.Config(seed = 2, n = 500, updatePct = 60, deletePct = 30, churnPct = 50),
      ChangeGen.Config(seed = 3, n = 500, updatePct = 0, deletePct = 0, churnPct = 0))) {
    test(s"compaction equals replay for mix u=${cfg.updatePct} d=${cfg.deletePct} churn=${cfg.churnPct}") {
      val gen = ChangeGen.generate(spark, cfg).cache()
      // per-table replay oracle (pk is unique per table in expectation;
      // key includes table to be exact)
      val raw = gen.select("seq", "op", "table_name", "pk", "pk_after", "val_after")
        .as[(Long, String, String, Long, Long, Option[Double])].collect()
      val state = collection.mutable.Map.empty[(String, Long), Double]
      raw.sortBy(_._1).foreach { case (_, op, t, pk, pkAfter, v) =>
        op match {
          case "D" => state.remove((t, pk))
          case "U" if pk != pkAfter =>
            state.remove((t, pk)); v.foreach(state((t, pkAfter)) = _)
          case _ => v.foreach(state((t, pk)) = _)
        }
      }
      val compacted = Compaction.compact(Transforms.updateSplit(gen))
        .filter(col("net_op") =!= "D")
        .select("table_name", "pk", "final_val")
        .as[(String, Long, Double)].collect()
        .map { case (t, pk, v) => (t, pk) -> v }.toMap
      assert(compacted == state.toMap)
    }
  }
}

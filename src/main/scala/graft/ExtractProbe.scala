package graft

import graft.model.Turn
import graft.pipeline.Pipeline
import org.apache.spark.sql.{Dataset, SparkSession}

/** Scratch: stage-by-stage decomposition of the headline extraction
  * pipeline (scan+decode vs salt-shuffle+sort vs fused extract map) to
  * find where the next throughput win lives. Min-of-K like ClusterProbe;
  * every stage forces FULL-WIDTH rows (a bare count() would let Catalyst
  * prune `text` out of the scan and measure nothing).
  */
object ExtractProbe {

  private def charSum(turns: Dataset[Turn]): Long =
    turns.mapPartitions { it =>
      var n = 0L
      it.foreach(t => n += (if (t.text == null) 0 else t.text.length))
      Iterator.single(n)
    }(org.apache.spark.sql.Encoders.scalaLong).reduce(_ + _)

  def main(args: Array[String]): Unit = {
    val corpusDir = args.headOption.getOrElse("/tmp/graft_bench_corpus")
    val nConvs = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "960000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.driver.memory", "16g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    if (!new java.io.File(corpusDir + "/_SUCCESS").exists()) {
      graft.synth.SynthDataset.turns(spark, nConvs)
        .repartition(spark.sparkContext.defaultParallelism)
        .write.mode("overwrite").parquet(corpusDir)
    }
    def turns = spark.read.parquet(corpusDir).as[Turn]

    def time(label: String)(f: => Long): Unit = {
      f // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label min=${ts.min}%.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    time("A scan+decode (full-width typed rows)") { charSum(turns) }
    time("B scan+salt+shuffle+sort (no extract)") {
      charSum(Pipeline.salted(spark, turns))
    }
    time("C full pipeline (salted + fused extract)") {
      Pipeline.run(spark, turns).count()
    }
    time("D extract map only (no salt shuffle)") {
      Pipeline.extractStage(spark, turns).count()
    }

    // per-kind single-thread cost of the pure function, over a sample
    val sample = turns.limit(200000).collect()
    val byKind = sample.groupBy(t => graft.extract.Extract.sniff(t.text))
    byKind.toSeq.sortBy(_._1).foreach { case (k, ts) =>
      ts.foreach(graft.extract.Extract.turn) // warm
      val sec = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        ts.foreach(graft.extract.Extract.turn)
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"kind=$k n=${ts.length} sec=$sec%.3f rate=${ts.length / sec}%.0f turns/sec/thread")
    }
    spark.stop()
  }
}

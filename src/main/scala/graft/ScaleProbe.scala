package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off scale spot-run for the ITERATIVE tier (round-6 verdict item):
  * the loop operators' 100 TB claims are design-verified and job-count
  * gated, but were never executed above the sf0.1 contract graph. This
  * probe runs each loop operator on the contract-shaped co-ordered-parts
  * graph at 1× and at a structure-identical 10× (each edge salted into 10
  * DISJOINT node-offset copies — same diameter, same round count, 10× the
  * edges/nodes), so the measured ratio isolates DATA-VOLUME scaling from
  * round-count scaling: a healthy per-round-partial-agg loop should grow
  * well under 10× wall-time at 10× edges, because at this absolute size
  * per-round job/checkpoint overhead, not data, dominates.
  *
  * Run manually (not part of the bench contract):
  *   sbt "runMain graft.ScaleProbe [sfDir] [orderCap]"
  * Results are recorded in SCALE.md ("Measured loop-tier scaling").
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val orderCap = args.lift(1).map(_.toLong).getOrElse(20000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val l = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .filter(col("l_orderkey") <= orderCap)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val edges1 = l.select(col("ok"), col("pk").as("pa"))
      .join(l.select(col("ok"), col("pk").as("pb")), "ok")
      .where(col("pa") < col("pb")).select("pa", "pb").distinct()
      .persist()
    val n1 = edges1.count()
    // 10 disjoint copies: offset node ids per salt so components never merge
    val off = lit(1000000000L)
    val edges10 = edges1
      .crossJoin(spark.range(10).select(col("id").as("salt")))
      .select((col("pa") + col("salt") * off).as("pa"),
        (col("pb") + col("salt") * off).as("pb"))
      .persist()
    val n10 = edges10.count()
    println(s"edges 1x=$n1 10x=$n10 (orderCap=$orderCap, $sfDir)")
    // optional third arg: ALSO run pageRank/seedDistance at `extra`x copies
    // (the trend check one decade up; unset = skip)
    val extra = args.lift(2).map(_.toInt)

    def seedsOf(e: DataFrame) = e.groupBy().agg(min(col("pa")).as("m"))
      .select(explode(sequence(lit(0L), lit(9L))).as("salt"), col("m"))
      .select((col("m") + col("salt") * off).as("s")).limit(10)
    val seeds1 = seedsOf(edges1).filter(col("s") < off)

    val ops = graft.ops.Graph
    def run(name: String, f: DataFrame => DataFrame): Unit = {
      def time(e: DataFrame): Double = {
        val t0 = System.nanoTime(); f(e).count(); (System.nanoTime() - t0) / 1e9
      }
      // warm-up on 1x, then timed 1x and 10x
      time(edges1)
      val t1 = time(edges1)
      val t10 = time(edges10)
      println(f"$name%-18s 1x=${t1}%.2fs 10x=${t10}%.2fs ratio=${t10 / t1}%.2f")
    }

    run("pageRank", e => ops.pageRank(e, "pa", "pb", iters = 3))
    run("pageRankDangling",
      e => ops.pageRank(e, "pa", "pb", iters = 3, redistributeDangling = true))
    run("hits", e => ops.hits(e, "pa", "pb", iters = 2))
    run("labelPropagation", e => ops.labelPropagation(e, "pa", "pb", rounds = 3))
    run("kCore", e => ops.kCore(e, "pa", "pb", k = 3L))
    run("seedDistance",
      e => ops.seedDistance(e, "pa", "pb",
        if (e eq edges1) seeds1 else seedsOf(edges1), "s", maxHops = 3))
    run("seedAttribution",
      e => ops.seedAttribution(e, "pa", "pb",
        if (e eq edges1) seeds1 else seedsOf(edges1), "s", maxHops = 3))
    run("ccStar", e => graft.ops.Dedup.connectedComponentsStar(
      e.select(col("pa").as("idA"), col("pb").as("idB"))))

    extra.foreach { m =>
      val edgesM = edges1
        .crossJoin(spark.range(m.toLong).select(col("id").as("salt")))
        .select((col("pa") + col("salt") * off).as("pa"),
          (col("pb") + col("salt") * off).as("pb"))
        .persist()
      println(s"edges ${m}x=${edgesM.count()}")
      def timeM(name: String, f: DataFrame => DataFrame): Unit = {
        val t0 = System.nanoTime(); f(edgesM).count()
        println(f"$name%-18s ${m}x=${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
      timeM("pageRank", e => ops.pageRank(e, "pa", "pb", iters = 3))
      timeM("seedDistance", e => ops.seedDistance(e, "pa", "pb",
        e.groupBy().agg(min(col("pa")).as("m"))
          .select(explode(sequence(lit(0L), lit(m.toLong - 1))).as("salt"), col("m"))
          .select((pmod(col("m"), off) + col("salt") * off).as("s")),
        "s", maxHops = 3))
    }
    spark.stop()
  }
}

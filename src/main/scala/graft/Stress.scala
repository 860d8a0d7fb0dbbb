package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Stress {
  def main(args: Array[String]): Unit = {
    val b = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    graft.sources.Tables.sessionConfigs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[stress] $name: ${(System.nanoTime()-t0)/1e9}%.1f s ($n rows)")
    }
    // 60M-row lineitem-equivalent agg (100x sf0.1)
    time("q1-style agg, 60M rows") {
      spark.range(60000000L)
        .select(
          (col("id") % 3).cast("string").as("flag"),
          (col("id") % 2).cast("string").as("status"),
          (col("id") % 50 + 1).cast("double").as("qty"),
          (col("id") % 10000).cast("double").as("price"))
        .groupBy("flag", "status")
        .agg(sum(col("qty").cast("decimal(18,2)")), sum(col("price").cast("decimal(18,2)")), count(lit(1)))
        .count()
    }
    // 20M heartbeat frames: encode UDF -> native decode expressions
    time("codec roundtrip, 20M frames") {
      spark.range(20000000L)
        .select(graft.functions.codecs.encode_heartbeat(col("id") % 1000, col("id"), col("id") * 1000).as("f"))
        .select(graft.functions.codecs.hb_client_id(col("f")).as("c"), graft.functions.codecs.hb_sequence(col("f")).as("s"))
        .filter(col("c") >= 0)
        .count()
    }
    // 1M-doc minhash-LSH dedup with REALISTIC distinctness (round-1 stress
    // used near-identical synthetic docs — every doc LSH-collided with
    // every neighbor, a corpus artifact, not an operator property). Here:
    // 40-token docs drawn from a 100k-token vocabulary via id-salted
    // hashes (distinct with overwhelming probability), plus 1% planted
    // near-dup twins (5 of 40 tokens perturbed, J ≈ 0.78 > threshold).
    // Scale check: candidate pairs stay O(planted), not O(n^2).
    time("minhash-LSH dedup, 1M docs (1% planted near-dups)") {
      val n = 1000000L
      val base = spark
        .range(n)
        .select(
          col("id"),
          concat_ws(
            " ",
            (0 until 40).map(k => pmod(xxhash64(col("id"), lit(k)), lit(100000)).cast("string")): _*
          ).as("text")
        )
      val twins = spark
        .range(n / 100)
        .select(
          (col("id") + 10000000L).as("id"),
          concat_ws(
            " ",
            (0 until 40).map { k =>
              if (k < 5) pmod(xxhash64(col("id"), lit(k), lit(1)), lit(100000)).cast("string")
              else pmod(xxhash64(col("id"), lit(k)), lit(100000)).cast("string")
            }: _*
          ).as("text")
        )
      // persist: time the OPERATOR, not per-scan regeneration of the
      // synthetic corpus (minhashPairs scans its input multiple times —
      // real corpora come from storage)
      val corpus = base.unionByName(twins).persist()
      corpus.count()
      val t0 = System.nanoTime()
      val pairs = graft.operators.Dedup
        .minhashPairs(corpus, col("text"), col("id"),
          n = 3, numHashes = 32, bands = 16, threshold = 0.5)
        .count()
      println(f"[stress]   near-dup pairs found: $pairs (planted ${n / 100}) in ${(System.nanoTime() - t0) / 1e9}%.1f s (corpus materialization excluded)")
      corpus.unpersist()
      pairs
    }
    // IVF cell assignment at the realistic nlist regime (nlist ≈ √N, here
    // 256 cells): the native NearestCells kernel vs the interpreted HOF
    // struct-sort formulation it replaced (same ordering contract).
    // Measured: 1.4 s vs 3.5 s — the HOF's per-centroid interpreted
    // lambda + struct alloc + full sort grows with nlist, the native
    // top-n selection doesn't.
    locally {
      val dim = 64
      val cents: Seq[Seq[Double]] =
        (0 until 256).map(c => (0 until dim).map(j => ((c * 31 + j * 7) % 100) / 100.0))
      val rows = spark
        .range(250000L)
        .select(
          col("id"),
          transform(sequence(lit(0), lit(dim - 1)), j => pmod(xxhash64(col("id"), j), lit(1000)).cast("double") / 1000.0).as("v")
        )
        .persist()
      rows.count()
      def hofCells(v: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        slice(
          array_sort(
            transform(typedlit(cents), (ct, i) => struct(graft.functions.vector.l2sq(v, ct).as("d"), i.as("cell")))
          ),
          1,
          1
        )(0).getField("cell")
      time("ivf assignment 250k x 64d x 256 cells, native kernel") {
        rows.select(element_at(graft.functions.vector.nearest_cells(col("v"), cents, 1), 1).as("cell"))
          .groupBy("cell").count().count()
      }
      time("ivf assignment 250k x 64d x 256 cells, interpreted HOF") {
        rows.select(hofCells(col("v")).as("cell")).groupBy("cell").count().count()
      }
      rows.unpersist()
      ()
    }
    spark.stop()
  }
}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Prof1 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[prof] $name%-28s ${(System.nanoTime()-t0)/1e9}%8.3f s  (n=$n)")
    }
    // warm
    spark.range(1000000).groupBy((col("id")%7).as("k")).count().count()
    docs.count()
    val sh = graft.ops.Dedup.shingles(col("text"), 3)
    val postings = docs.select(col("doc_id"), explode(sh).as("s"))
    time("postings (interpreted HOF)")(postings.count())
    time("postings again")(postings.count())
    val p = postings.persist(); p.count()
    time("self-join pairs")(
      p.as("a").join(p.as("b"), col("a.s")===col("b.s") && col("a.doc_id")<col("b.doc_id"))
        .groupBy(col("a.doc_id"), col("b.doc_id")).count().count())
    time("jaccard full")(graft.ops.Dedup.ngramJaccard(docs).count())
    time("jaccard full again")(graft.ops.Dedup.ngramJaccard(docs).count())
    time("minhash full")(graft.ops.Dedup.minhashLsh(docs).count())
    time("editdist full")(graft.ops.Dedup.editDistancePairs(docs).count())
    spark.stop()
  }
}

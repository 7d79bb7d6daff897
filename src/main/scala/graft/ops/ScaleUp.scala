package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Deterministic 10× scale-up of a testdata dir — the ONE generator
  * behind both the StressSf1Spec slope gate and the full-catalog sf1
  * bench (round 8, VERDICT r7 #5), so the two can never drift onto
  * different sf1 semantics.
  *
  * Copies are DISJOINT in a structure-preserving way: every key carries a
  * per-copy offset and every similarity-bearing value (tokens, names,
  * embedding signs) a per-copy transform, so within-copy dup/join/near-dup
  * structure mirrors the original corpus while cross-copy similarity
  * collapses. A byte-identical 10× would instead explode OUTPUT sizes
  * (pair counts ×100 on near-dup tiers), charging queries for load
  * growth rather than slope — the failure mode the round-6 spec design
  * note documents.
  *
  * Per-table transforms:
  *   - `region`/`nation` pass through UNCHANGED — dimension tables are
  *     fixed-size at every TPC-H scale factor, and the broadcast-join
  *     plans the bench grades depend on them STAYING broadcastable;
  *   - fact keys get copy offsets mirrored across tables (custkey ↔
  *     orders, orderkey ↔ lineitem, partkey/suppkey ↔ lineitem) so FK
  *     joins land within-copy;
  *   - `documents.text` suffixes EVERY token with the copy id: shingle
  *     spaces of distinct copies are disjoint (near-dup structure = 10
  *     disjoint replicas);
  *   - `customer.c_name` gets a doubled-letter suffix (cross-copy edit
  *     distance ≥ 2 — a 1-char suffix would put all 10 copies of a name
  *     inside the fuzzy join's deletion neighborhood);
  *   - `embeddings.embedding` is multiplied by a copy-keyed ±1 sign
  *     PATTERN per dimension: a diagonal orthogonal transform, so
  *     within-copy dot products are bit-identical (signs square away)
  *     while cross-copy cosine decorrelates to ~0 instead of staying 1.0
  *     and exploding every LSH bucket 10×. */
object ScaleUp {

  private val COPIES = 10

  /** Build (once per data epoch) the full 10× lake from `baseDir` and
    * return its directory. [[BuildOnce.dirFixture]] guards the build
    * CROSS-PROCESS (round 9, ADVICE r8 #2: the old `_built` sentinel was
    * check-then-build, so a StressSf1Spec JVM racing a bench JVM could
    * both build and swap files under each other's reads): the lake is
    * assembled in a staging dir and published with one atomic directory
    * rename. The epoch-keyed dir self-invalidates when the source lake
    * regenerates. */
  def ensureTenfold(spark: SparkSession, baseDir: String): String = {
    val dir = TempFiles.dir(s"sf1_full_${TempFiles.tag(baseDir)}")
    BuildOnce.dirFixture(java.nio.file.Paths.get(dir)) { out =>
      // each table lands as ONE parquet FILE named exactly like the
      // driver's testdata ($dir/$name.parquet is a file, not a parquet
      // directory): the streaming landing-dir trick symlinks that file
      // (a directory symlink is an unmonitored subdirectory to Spark's
      // file source — zero batches, found the hard way at the round-8
      // sf1 bench), and the batch reader handles either shape
      // stage under this build's UNIQUE dir name: a shared stage path
      // would let two racing builders overwrite each other's part files
      // mid-build — the isolation BuildOnce exists to provide
      val stageRoot = s"sf1_stage_${out.getFileName}"
      def write(name: String, df: DataFrame): Unit = {
        val stage = TempFiles.dir(s"$stageRoot/$name")
        df.repartition(1).write.mode("overwrite").parquet(stage)
        val s = java.nio.file.Files.list(java.nio.file.Paths.get(stage))
        val part = try s.filter(p => p.toString.endsWith(".parquet"))
          .findFirst().get() finally s.close()
        java.nio.file.Files.move(part, out.resolve(s"$name.parquet"),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
      def tenfold(name: String)(f: (DataFrame, Int) => DataFrame): Unit = {
        val base = Tables.table(spark, baseDir, name)
        write(name, (0 until COPIES).map(i => f(base, i)).reduce(_ unionAll _))
      }
      // fixed-size dimensions: verbatim
      Seq("region", "nation").foreach { n =>
        write(n, Tables.table(spark, baseDir, n))
      }
      tenfold("customer") { (d, i) =>
        val c = ('a' + i).toChar.toString
        d.withColumn("c_custkey", col("c_custkey") + lit(i * 10000000L))
          .withColumn("c_name", concat(col("c_name"), lit(c + c)))
      }
      tenfold("supplier") { (d, i) =>
        d.withColumn("s_suppkey", col("s_suppkey") + lit(i * 10000000L))
      }
      tenfold("part") { (d, i) =>
        d.withColumn("p_partkey", col("p_partkey") + lit(i * 10000000L))
      }
      tenfold("orders") { (d, i) =>
        d.withColumn("o_orderkey", col("o_orderkey") + lit(i * 100000000L))
          .withColumn("o_custkey", col("o_custkey") + lit(i * 10000000L))
      }
      tenfold("lineitem") { (d, i) =>
        d.withColumn("l_orderkey", col("l_orderkey") + lit(i * 100000000L))
          .withColumn("l_partkey", col("l_partkey") + lit(i * 10000000L))
          .withColumn("l_suppkey", col("l_suppkey") + lit(i * 10000000L))
      }
      tenfold("events") { (d, i) =>
        d.withColumn("event_id", col("event_id") + lit(i * 1000000000L))
          .withColumn("user_id", col("user_id") + lit(i * 10000000L))
      }
      tenfold("documents") { (d, i) =>
        d.withColumn("doc_id", col("doc_id") + lit(i * 10000000L))
          .withColumn("text",
            regexp_replace(col("text"), "(\\S+)", "$1_" + i))
      }
      tenfold("embeddings") { (d, i) =>
        // per-(copy, dim) ±1 sign via murmur3: diagonal orthogonal map
        d.withColumn("vec_id", col("vec_id") + lit(i * 10000000L))
          .withColumn("embedding", expr(
            s"transform(embedding, (x, j) -> " +
              s"CASE WHEN pmod(hash(j, $i), 2) = 0 THEN x ELSE -x END)"))
      }
      // drop the staging litter (part-file dirs whose one file moved out)
      def rmTree(p: java.nio.file.Path): Unit = {
        if (java.nio.file.Files.isDirectory(p)) {
          val s = java.nio.file.Files.list(p)
          try s.iterator().asScala.toVector.foreach(rmTree) finally s.close()
        }
        java.nio.file.Files.deleteIfExists(p)
      }
      rmTree(java.nio.file.Paths.get(TempFiles.dir(stageRoot)))
    }
    dir
  }
}

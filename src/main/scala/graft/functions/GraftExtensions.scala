package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Config-driven entry point: set
  * `spark.sql.extensions=graft.functions.GraftExtensions` and every graft
  * kernel is installed in each new session with no code call — the standard
  * way a Spark library ships Catalyst extensions (`Tables.table` still
  * registers imperatively for sessions created without the conf). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, name, usage, "", "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    def inject(name: String, usage: String)
              (builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((FunctionIdentifier(name), info(name, usage), builder))

    inject("graft_dot", "sequential-fold dot product of two array<double>") {
      es => DotProductD(es.head, es(1))
    }
    inject("graft_shingles", "distinct word trigram shingles") {
      es => WordShingles(es.head, 3)
    }
    inject("graft_minhash_sig", "32-seed MinHash signature of a shingle set") {
      es => MinHashSig(es.head, 32)
    }
    inject("graft_jaccard", "exact Jaccard of two distinct-element arrays") {
      es => JaccardSim(es.head, es(1))
    }
    inject("graft_simhash64", "64-bit SimHash of a token stream") {
      es => SimHash64(es.head)
    }
    inject("graft_lsh_bands", "banded hyperplane LSH keys of array<double>") {
      es => LshBandKeys(es.head,
        es(1).eval().asInstanceOf[Int], es(2).eval().asInstanceOf[Int])
    }
    inject("graft_nearest_centroids", "p nearest centroid cells by cosine") {
      es => NearestCentroids(es.head, es(1), es(2))
    }
    inject("graft_winnow", "winnowing rolling-hash fingerprints") {
      es => Winnow(es.head,
        es(1).eval().asInstanceOf[Int], es(2).eval().asInstanceOf[Int])
    }
  }
}

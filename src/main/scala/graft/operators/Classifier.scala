package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality curation: the classifier-filtering stage of a
  * modern LLM data pipeline (FineWeb-Edu / DCLM style — train a small
  * quality classifier, score every document, keep the top slice). The
  * heuristic d-rows (d02/d11/d39) hand-weight their signals; this learns
  * the weights from labeled (or weakly-labeled) examples instead.
  *
  * The model is logistic regression trained by FULL-BATCH gradient
  * descent expressed in DataFrame algebra: every iteration is ONE narrow
  * scan — the current weights bake into a literal margin expression, and
  * the d+1 gradient components come back from a single aggregate row
  * (sum((p−y)·x_j)/n). Nothing corpus-sized ever leaves the executors;
  * the driver holds d+1 doubles. Features standardize once (one extra
  * aggregate) so a fixed learning rate converges regardless of feature
  * scale, and the returned weights FOLD the standardization in — scoring
  * needs no stats table.
  *
  * Scale shape at 100 TB: training runs on a SAMPLE (classifier training
  * saturates long before corpus scale — pass `docs.sample(...)`), each
  * iteration scanning only the checkpointed (label, features) projection;
  * scoring the full corpus is one broadcast-weights map pass
  * ([[logisticScore]] is a pure per-row expression). Determinism: fixed
  * iteration count, fixed learning rate, exact aggregate sums in a fixed
  * expression order — same weights on every run at every partitioning
  * (modulo float addition order inside Spark's sum, which is
  * partition-order-dependent; gates therefore assert RECOVERY quality,
  * not bitwise weights — the d51 pattern for float-bearing operators).
  */
object Classifier {

  /** Train logistic regression on `labelCol` (0/1) over `featureCols`.
    * Returns weights `[w0, w1, …, wd]` (intercept first) in RAW feature
    * space — standardization is folded in. `df` should be small enough to
    * re-scan `iters` times cheaply (checkpoint or sample upstream). */
  def logisticTrain(
      df: DataFrame, featureCols: Seq[String], labelCol: String,
      iters: Int = 40, learningRate: Double = 1.0): Array[Double] = {
    require(featureCols.nonEmpty && iters > 0)
    val d = featureCols.length
    // null label/feature cells would poison the aggregate sums (sum
    // skips nulls per-column, desynchronizing the gradient components) —
    // train only on fully-populated rows, and fail loudly when none exist
    val clean = df.filter((labelCol +: featureCols)
      .map(c => col(c).isNotNull).reduce(_ && _))
    // one pass: n, mean, std per feature (population std; ±0-guard)
    val statRow = clean.select(
      (count(lit(1)).cast("double") +: featureCols.flatMap { c =>
        Seq(avg(col(c).cast("double")),
          coalesce(stddev_pop(col(c).cast("double")), lit(0.0)))
      }): _*).head
    val n = statRow.getDouble(0)
    require(n > 0,
      "empty training set (after dropping rows with null label/features)")
    val mu = Array.tabulate(d)(j => statRow.getDouble(1 + 2 * j))
    val sd = Array.tabulate(d)(j => math.max(statRow.getDouble(2 + 2 * j), 1e-12))
    def z(j: Int): Column =
      (col(featureCols(j)).cast("double") - lit(mu(j))) / lit(sd(j))
    var w = Array.fill(d + 1)(0.0) // standardized space, intercept first
    var it = 0
    while (it < iters) {
      val margin = (0 until d).foldLeft(lit(w(0)): Column) {
        (acc, j) => acc + z(j) * lit(w(j + 1))
      }
      val p = lit(1.0) / (lit(1.0) + exp(-margin))
      val err = p - col(labelCol).cast("double")
      val g = clean.select(
        (sum(err) +: (0 until d).map(j => sum(err * z(j)))): _*).head
      var j = 0
      while (j <= d) {
        w(j) -= learningRate * g.getDouble(j) / n
        j += 1
      }
      it += 1
    }
    // fold standardization into raw-space weights:
    //   w·z + w0 = Σ (wj/sdj)·xj + (w0 − Σ wj·muj/sdj)
    val raw = new Array[Double](d + 1)
    raw(0) = w(0) - (0 until d).map(j => w(j + 1) * mu(j) / sd(j)).sum
    (0 until d).foreach(j => raw(j + 1) = w(j + 1) / sd(j))
    raw
  }

  /** [[logisticTrain]] with the training matrix COLLECTED — the right
    * shape when the labeled set is a driver-sized sample (it almost
    * always is: classifier quality saturates at 10⁴–10⁶ examples while
    * the corpus is 10⁹⁺ — the same driver-held-artifact pattern as the
    * ANN codebooks and [[TextAnalysis.bpeVocab]]). One distributed scan
    * collects ≤ `maxRows` (d+2 doubles per row); the GD loop runs locally
    * in microseconds instead of paying one Spark job per iteration.
    * Fails loudly past the cap rather than silently truncating. */
  def logisticTrainCollected(
      df: DataFrame, featureCols: Seq[String], labelCol: String,
      iters: Int = 200, learningRate: Double = 1.0,
      maxRows: Int = 1 << 20): Array[Double] = {
    require(featureCols.nonEmpty && iters > 0)
    val d = featureCols.length
    // drop rows with any null label/feature BEFORE collecting — a single
    // null cell would otherwise surface as a bare NullPointerException
    // from getDouble deep in the GD loop
    val rows = df.filter((labelCol +: featureCols)
        .map(c => col(c).isNotNull).reduce(_ && _))
      .select(
        (col(labelCol).cast("double") +: featureCols.map(c => col(c).cast("double"))): _*)
      .limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"training set exceeds maxRows=$maxRows — sample upstream")
    val n = rows.length
    require(n > 0,
      "empty training set (after dropping rows with null label/features)")
    val y = rows.map(_.getDouble(0))
    val x = rows.map(r => Array.tabulate(d)(j => r.getDouble(1 + j)))
    val mu = Array.tabulate(d)(j => x.map(_(j)).sum / n)
    val sd = Array.tabulate(d) { j =>
      val m = mu(j)
      math.max(math.sqrt(x.map(v => (v(j) - m) * (v(j) - m)).sum / n), 1e-12)
    }
    val z = x.map(v => Array.tabulate(d)(j => (v(j) - mu(j)) / sd(j)))
    val w = Array.fill(d + 1)(0.0)
    var it = 0
    while (it < iters) {
      val g = Array.fill(d + 1)(0.0)
      var i = 0
      while (i < n) {
        var m = w(0); var j = 0
        while (j < d) { m += w(j + 1) * z(i)(j); j += 1 }
        val e = 1.0 / (1.0 + math.exp(-m)) - y(i)
        g(0) += e; j = 0
        while (j < d) { g(j + 1) += e * z(i)(j); j += 1 }
        i += 1
      }
      var j = 0
      while (j <= d) { w(j) -= learningRate * g(j) / n; j += 1 }
      it += 1
    }
    val raw = new Array[Double](d + 1)
    raw(0) = w(0) - (0 until d).map(j => w(j + 1) * mu(j) / sd(j)).sum
    (0 until d).foreach(j => raw(j + 1) = w(j + 1) / sd(j))
    raw
  }

  /** σ(w·x) as a pure per-row column — the full-corpus scoring pass
    * (weights broadcast as literals; no join, no shuffle). */
  def logisticScore(featureCols: Seq[String], weights: Array[Double]): Column = {
    require(weights.length == featureCols.length + 1)
    val margin = featureCols.zipWithIndex.foldLeft(lit(weights(0)): Column) {
      case (acc, (c, j)) => acc + col(c).cast("double") * lit(weights(j + 1))
    }
    lit(1.0) / (lit(1.0) + exp(-margin))
  }
}

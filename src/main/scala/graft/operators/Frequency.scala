package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.Tables

/** Frequent-items (heavy-hitters) detection via per-partition Misra–Gries
  * summaries — the candidate-generation + exact-verification pattern that
  * finds every key above a frequency threshold WITHOUT a full groupBy of
  * the raw key space.
  *
  * Why not just `groupBy(key).count()`? At 100 TB the key space itself
  * can be huge (tokens, URLs, user agents); a full count shuffles one row
  * per DISTINCT key. Misra–Gries bounds the per-partition state to `cap`
  * counters and guarantees every item with global frequency
  * > N/(cap+1) survives in at least one partition's summary (if
  * freq = Σ_p freq_p > Σ_p N_p/(cap+1), some partition has
  * freq_p > N_p/(cap+1), and MG never evicts such an item). The exact
  * verification pass then counts ONLY the candidate keys — a broadcast
  * semi-join prunes the shuffle to at most `cap × partitions` keys — and
  * the final threshold filter makes the output exact and DETERMINISTIC:
  * whatever extra candidates a particular partitioning produced are
  * dropped by the exact filter, so the result is independent of
  * partitioning and engine (the DuckDB oracle computes it as a plain
  * HAVING query).
  */
object Frequency {

  /** Per-partition Misra–Gries: keep ≤ `cap` counters; a key beyond
    * capacity decrements all (amortized O(1) per item). Returns the
    * surviving candidate keys. This is the one genuinely sequential
    * per-partition state machine in the family — `mapPartitions` is the
    * right tool, not a window. */
  def mgCandidates(items: Dataset[String], cap: Int): DataFrame = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      val counters = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { key =>
        counters.get(key) match {
          case Some(c) => counters.update(key, c + 1)
          case None if counters.size < cap => counters.update(key, 1L)
          case None =>
            // decrement-all; drop zeroed counters
            val dead = List.newBuilder[String]
            counters.foreach { case (k, c) =>
              if (c == 1L) dead += k else counters.update(k, c - 1)
            }
            dead.result().foreach(counters.remove)
        }
      }
      counters.keysIterator
    }.toDF("key").distinct()
  }

  /** Exact heavy hitters of a key column: all keys with
    * freq · (cap+1) > N, found via MG candidates → broadcast semi-join
    * prune → exact count → threshold. Output is exact top-share keys with
    * their counts and corpus share, ordered by (freq desc, key).
    *
    * NULL is a first-class key: the MG state machine counts it like any
    * other value (HashMap admits a null key) and the candidate prune uses
    * null-safe equality (`<=>`) — a plain equi-join would silently drop
    * the NULL group that SQL GROUP BY (and the DuckDB oracle) reports, so
    * a corpus where NULL exceeds the 1/(cap+1) share would diverge. */
  def heavyHitters(items: Dataset[String], cap: Int): DataFrame = {
    val spark = items.sparkSession
    val df = items.toDF("key")
    val cands = mgCandidates(items, cap)
    val total = df.agg(count(lit(1)).as("n_total"))
    df.join(broadcast(cands.withColumnRenamed("key", "__cand_key")),
        col("key") <=> col("__cand_key"))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("freq"))
      .crossJoin(broadcast(total))
      .where(col("freq") * (cap + 1) > col("n_total"))
      .select(col("key"), col("freq"), col("n_total"),
        (col("freq").cast(DoubleType) / col("n_total")).as("share"))
      .orderBy(col("freq").desc, col("key"))
  }

  /** Default MG capacity for the named query: languages above 20% of the
    * corpus (φ = 1/(cap+1) = 1/5). */
  val LangCap = 4

  /** Named query: dominant languages of the document corpus — every
    * language holding more than a fifth of all documents. */
  def heavyLangs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    heavyHitters(Tables.documents(spark, dir).select(col("lang")).as[String], LangCap)
  }

  object oracle {
    val heavyLangs: String =
      s"""WITH c AS (SELECT lang AS key, COUNT(*) AS freq FROM documents GROUP BY 1),
         |t AS (SELECT CAST(SUM(freq) AS BIGINT) AS n_total FROM c)
         |SELECT key, freq, n_total, CAST(freq AS DOUBLE) / n_total AS share
         |FROM c, t
         |WHERE freq * ${LangCap + 1} > n_total
         |ORDER BY freq DESC, key""".stripMargin
  }
}

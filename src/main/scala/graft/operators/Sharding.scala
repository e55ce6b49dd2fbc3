package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.portableHash60
import graft.sources.Tables

/** Rendezvous (highest-random-weight) sharding — the assignment rule
  * a storage/serving layer uses when shard membership must survive
  * cluster resizing with MINIMAL movement: key k goes to
  * argmax over shards s of hash(k, s). Unlike modulo hashing (which
  * reshuffles ~everything when the shard count changes), HRW moves
  * exactly the keys whose argmax becomes the new shard — an expected
  * 1/(n+1) of them on an n -> n+1 expansion (Thaler & Ravishankar,
  * "Using name-based mappings to increase hit rates", ToN 1998).
  */
object Sharding {

  /** Shard counts before/after the expansion the report measures. */
  val ShardsBefore = 8
  val ShardsAfter = 9

  /** q268: the HRW assignment computed under [[ShardsBefore]] and
    * [[ShardsAfter]] shards in ONE pass (explode the shard ids once;
    * the before-assignment is the argmax restricted to s <
    * ShardsBefore, the after-assignment the unrestricted argmax), with
    * the (before, after) transition matrix as output. The hash match
    * certifies the argmax rule itself AND the minimal-movement
    * property the partitioner is chosen for: the diagonal rows
    * (before = after) must carry ~n/(n+1) of the keys, every
    * off-diagonal row must land on the NEW shard only — any key that
    * "moved" between two old shards would be an HRW violation and
    * lands as an off-diagonal, off-new-shard row that breaks the hash.
    *
    * Scale shape: one explode (x ShardsAfter rows), one map-side-
    * combined per-doc argmax (max of a (hash, shard) struct), one
    * bounded groupBy on the <= n x (n+1) transition cells. */
  def rendezvousQuery(spark: SparkSession, dir: String): DataFrame =
    rendezvousReport(Tables.documents(spark, dir).select(col("doc_id")))

  /** [[rendezvousQuery]]'s core over any (doc_id) frame. */
  def rendezvousReport(keys: DataFrame): DataFrame = {
    val exploded = keys
      .select(col("doc_id"),
        explode(expr(s"sequence(0, ${ShardsAfter - 1})")).as("s"))
      .withColumn("h",
        portableHash60(concat(col("doc_id").cast("string"), lit("#"),
          col("s").cast("string"))))
    exploded.groupBy("doc_id")
      .agg(
        max(when(col("s") < ShardsBefore, struct(col("h"), col("s"))))
          .as("b"),
        max(struct(col("h"), col("s"))).as("a"))
      .select(col("b.s").cast("int").as("shard_before"),
        col("a.s").cast("int").as("shard_after"))
      .groupBy("shard_before", "shard_after")
      .agg(count(lit(1)).cast("long").as("n_docs"))
      .orderBy("shard_before", "shard_after")
  }

  /** DuckDB oracle for [[rendezvousQuery]] — same md5-prefix hash,
    * same argmax (arg_max is tie-free here: the 60-bit hash is unique
    * per (doc, shard) in practice, and the md5 preimage differs). */
  def rendezvousOracleSql: String =
    s"""WITH e AS (SELECT doc_id, s,
           CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#' ||
             CAST(s AS VARCHAR)), 1, 15)) AS BIGINT) AS h
         FROM documents, range(0, $ShardsAfter) r(s)),
       a AS (SELECT doc_id,
           arg_max(CASE WHEN s < $ShardsBefore THEN s END,
             CASE WHEN s < $ShardsBefore THEN h END) AS shard_before,
           arg_max(s, h) AS shard_after
         FROM e GROUP BY 1)
     SELECT CAST(shard_before AS INT) AS shard_before,
       CAST(shard_after AS INT) AS shard_after,
       CAST(count(*) AS BIGINT) AS n_docs
     FROM a GROUP BY 1, 2 ORDER BY 1, 2"""
}

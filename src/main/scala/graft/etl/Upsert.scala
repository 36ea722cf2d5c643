package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Idempotent upsert — the reference's `fetch_or_insert`
  * (`/root/reference/src/extract/pg.rs:67-99`: lookup, on miss insert,
  * re-fetch; notably *not* atomic there — two statements, no tx) as a
  * batch dataflow: the merged result keeps every existing row and adds
  * only incoming rows whose key is absent.
  *
  * On a MERGE-capable sink (Delta/Iceberg) this maps to `MERGE INTO`;
  * on plain parquet it is the anti-join + union rewrite below followed
  * by an overwrite. One shuffle on the key (or none, if the existing
  * side is bucketed on it).
  */
object Upsert {

  /** existing ∪ (incoming ⟕anti existing) on `keys`. Deterministic:
    * for a key present in both, the existing row wins (the reference's
    * semantics — it only inserts on miss, never updates). */
  def merge(existing: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame =
    existing.unionByName(
      incoming.join(existing.select(keys.map(col): _*), keys, "left_anti"))

  /** Update-wins variant (upsert proper): incoming replaces matching
    * keys, existing rows without a match survive. */
  def mergeUpdate(existing: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame =
    incoming.unionByName(
      existing.join(incoming.select(keys.map(col): _*), keys, "left_anti"))
}

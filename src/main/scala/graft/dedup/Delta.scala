package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental corpus diff — what changed between two snapshots of a
  * document table, by id AND by content: the op a periodic ingest
  * pipeline runs so downstream stages (dedup, filtering, indexing)
  * process only the delta, not the full 100 TB corpus.
  *
  * Statuses (keyed by the union of doc ids):
  *  - `added`     — id only in the new snapshot, content seen nowhere
  *                  in the old one;
  *  - `removed`   — id only in the old snapshot, content gone from the
  *                  new one;
  *  - `changed`   — id in both, content digest differs;
  *  - `moved`     — id only in one side but the content digest exists
  *                  on the other side under a different id (a rename /
  *                  re-crawl under a new key; `moved_to` carries the
  *                  smallest matching counterpart id). Downstream dedup
  *                  can skip `moved` rows entirely.
  * Unchanged rows are omitted (the whole point is the delta).
  *
  * Content identity = (xxhash64, md5) of the raw text — the same
  * two-digest content-addressing argument as [[Dedup.exact]], minus
  * that op's normalization (a snapshot diff must see whitespace/case
  * edits as changes).
  *
  * Scale shape: digests map-side; ONE full-outer equi-join on id plus
  * two digest-keyed semi-join lookups over only the added/removed
  * remainder (delta-sized, not corpus-sized). No text moves after the
  * scan.
  */
object Delta {

  def corpusDelta(oldDocs: DataFrame, newDocs: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    def digested(df: DataFrame, tag: String) =
      df.select(col(idCol).cast("long").as(s"_id$tag"),
        xxhash64(col(textCol)).as(s"_h1$tag"),
        md5(col(textCol).cast("binary")).as(s"_h2$tag"))
    val o = digested(oldDocs, "_o")
    val n = digested(newDocs, "_n")
    val joined = o.join(n, col("_id_o") === col("_id_n"), "full_outer")
    val changed = joined
      .filter(col("_id_o").isNotNull && col("_id_n").isNotNull &&
        (col("_h1_o") =!= col("_h1_n") || col("_h2_o") =!= col("_h2_n")))
      .select(col("_id_o").as("doc_id"), lit("changed").as("status"),
        lit(null).cast("long").as("moved_to"))
    // ids gone from / new to the snapshot, with their content digests
    val removedIds = joined.filter(col("_id_n").isNull)
      .select(col("_id_o").as("_id"), col("_h1_o").as("_h1"), col("_h2_o").as("_h2"))
    val addedIds = joined.filter(col("_id_o").isNull)
      .select(col("_id_n").as("_id"), col("_h1_n").as("_h1"), col("_h2_n").as("_h2"))
    // content-level matches between the two remainders: a move/rename
    val moveTargets = addedIds.groupBy("_h1", "_h2")
      .agg(min(col("_id")).as("_to"))
    val moveSources = removedIds.groupBy("_h1", "_h2")
      .agg(min(col("_id")).as("_to"))
    val removed = removedIds.join(moveTargets, Seq("_h1", "_h2"), "left")
      .select(col("_id").as("doc_id"),
        when(col("_to").isNotNull, "moved").otherwise("removed").as("status"),
        col("_to").as("moved_to"))
    val added = addedIds.join(moveSources, Seq("_h1", "_h2"), "left")
      .select(col("_id").as("doc_id"),
        when(col("_to").isNotNull, "moved").otherwise("added").as("status"),
        col("_to").as("moved_to"))
    changed.unionByName(removed).unionByName(added)
  }
}

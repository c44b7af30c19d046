package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{coalesce, expr, lit, not}

/** CHECK constraints for the manifest-committed stores — the
  * write-side data-quality gate every production table format pairs
  * with its schema: a predicate DECLARED ON THE STORE (not passed by
  * each writer) that every ingested row must satisfy, enforced BEFORE
  * the commit so a violating batch changes nothing — no committed
  * version, no data files, no debris — instead of poisoning the store
  * and every downstream consumer of its change feed.
  *
  * Mechanics:
  *  - the constraint is a manifest TAG (`check=<spark-sql predicate>`)
  *    riding the same atomic commit as the file list — declared at
  *    build, visible to every writer through catalog metadata alone,
  *    and re-declarable (a later commit's tag supersedes: newest live
  *    version wins, the same resolution as the schema tag);
  *  - enforcement is one `filter(NOT coalesce(pred, false)).count()`
  *    over the BATCH — O(batch), never O(store), map-side only; CHECK
  *    semantics are pinned SQL-standard-strict for ingest: a row
  *    passes only when the predicate evaluates TRUE, so a NULL
  *    predicate (e.g. a NULL in a compared column) is a violation —
  *    the conservative reading a quality gate wants;
  *  - the violation failure names the count and the constraint, and
  *    is raised BEFORE any file is written.
  *
  * 100 TB shape: the gate costs one pass over rows the writer is
  * about to hash/bucket anyway; the constraint travels with the store
  * so a fleet of independent ingest streams cannot drift on what
  * "valid" means.
  */
object StoreConstraints {

  private val TagPrefix = "check="

  /** The store's active CHECK constraint: the `check=` tag of the
    * NEWEST live version that declares one, None for an unconstrained
    * store. Driver-side manifest reads only.
    */
  def constraintOf(base: String,
      catalog: IndexCatalogOps = IndexCatalog): Option[String] =
    catalog.newestTag(base, TagPrefix).map(_.drop(TagPrefix.length))

  /** The commit tag declaring `predicate` as the store's constraint. */
  def declareTag(predicate: String): String = {
    require(!predicate.contains("\n"), "constraint predicates are single-line")
    TagPrefix + predicate
  }

  /** Enforce the store's declared constraint (if any) on an ingest
    * batch: returns the batch untouched when every row passes (or the
    * store declares no constraint); raises — before anything is
    * written — when any row's predicate is not TRUE, naming the
    * violation count.
    */
  def enforce(batch: DataFrame, base: String,
      catalog: IndexCatalogOps = IndexCatalog): DataFrame = {
    constraintOf(base, catalog).foreach { c =>
      val violations =
        batch.filter(not(coalesce(expr(c), lit(false)))).count()
      if (violations > 0)
        throw new IllegalArgumentException(
          s"CHECK constraint violated: $violations row(s) of the batch " +
            s"fail [$c]; nothing was committed to $base")
    }
    batch
  }
}

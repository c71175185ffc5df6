package graft.serve

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dsl.FilterDsl
import graft.model.CanonicalSchema
import graft.store.Store

/** Serving layer: the reference's query lifecycle (SURVEY.md §3.1/§3.2)
  * re-expressed over a partition-pruned parquet PROD zone.
  *
  * Per request: parse/normalize the JSON filter DSL, validate + cast
  * against the schema and per-table queryable columns, compile to a Column
  * predicate, force the mandatory `table_name` partition predicate, apply
  * keyset pagination on `row_uid`, and drop service + all-null columns
  * from the returned page (reference: facade.py:112-164, app.py:42-185).
  *
  * Schema + queryable-column maps are cached on the driver so a request
  * costs exactly one Spark job (the reference re-reads `_metadata` from
  * SQLite per request — SURVEY.md §4 flags this as the thing to fix).
  */
final class QueryService(spark: SparkSession, store: Store) {

  val DefaultLimit = 1000   // reference: app.py:18
  val MaxLimit = 5000       // reference: app.py:19

  // re-resolved per request: a cached DataFrame would pin the parquet
  // file listing and break (or serve stale data) after a re-stage
  // overwrites PROD; schema/queryable maps stay driver-cached and are
  // dropped via refresh()
  private def prod: DataFrame = store.readProd()
  private lazy val queryableCache =
    scala.collection.concurrent.TrieMap.empty[String, Set[String]]

  /** Invalidate driver-side caches after a re-stage. */
  def refresh(): Unit = queryableCache.clear()

  import QueryService.Page

  def query(tableName: String, filtersJson: String = "{}",
            limit: Int = DefaultLimit, cursor: Option[Long] = None,
            cols: Option[Seq[String]] = None): Page = {
    require(store.isStaged, s"collection is not staged")
    val queryable = queryableCache.getOrElseUpdate(
      tableName, store.queryableColumns(tableName))
    require(queryable.size > 1, s"table '$tableName' is not staged")

    val snapshot = prod
    val pred = FilterDsl.compileJson(filtersJson, snapshot.schema, Some(queryable))
    val clamped = math.min(math.max(limit, 1), MaxLimit)

    // optional column projection (reference: generate_select_sql cols,
    // utils.py:244) — validated against the schema; filters may still
    // reference unprojected columns (WHERE over the full row, SELECT of
    // the subset), so the predicate applies before the select; Catalyst
    // prunes the scan to the union of filter + projected columns
    cols.foreach(_.foreach(c => require(snapshot.columns.contains(c),
      s"unknown column '$c'")))

    // mandatory partition predicate (reference: facade.py:138) — prunes the
    // table_name partition directories before the filter even runs
    val filtered = snapshot
      .where(col("table_name") === tableName)
      .where(pred)
    val base = cols.fold(filtered)(cs =>
      filtered.select((cs ++ Seq("row_uid", "table_name")).distinct.map(col): _*))
    val page = graft.ops.Windows.keysetPage(base, "row_uid", cursor, clamped)

    // page shaping happens on the collected page (<= 5000 rows), exactly
    // like the reference shapes the page, not the table (app.py:164-185)
    val rows = page.collect()
    val nextCursor =
      if (rows.length < clamped) None
      else Some(rows.last.getAs[Long]("row_uid"))

    val collected = spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), page.schema)
    val service = CanonicalSchema.serviceColumns ++ Seq("ingest_ts")
    val kept = collected.drop(service: _*)
    // drop all-null columns over the page (reference: app.py:180)
    val nonNullCounts = rows.headOption.map { _ =>
      kept.columns.filter { c =>
        rows.exists(r => { val i = page.schema.fieldIndex(c); !r.isNullAt(i) })
      }
    }.getOrElse(kept.columns)
    Page(kept.select(nonNullCounts.map(col).toIndexedSeq: _*), nextCursor)
  }
}

object QueryService {
  /** One page of results + the keyset cursor for the next page. */
  final case class Page(data: org.apache.spark.sql.DataFrame,
                        nextCursor: Option[Long])
}

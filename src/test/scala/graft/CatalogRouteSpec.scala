package graft

import graft.cdc.Cdc

/** cdc_catalog_route: the reference's tableExists→append/create sink
  * discipline against the session catalog, driven in two waves so one
  * run takes BOTH branches; the catalog read-back must reproduce the
  * derived-column routing summary bit-for-bit.
  */
class CatalogRouteSpec extends SparkSpec {
  import spark.implicits._

  test("catalog round-trip equals the derived-column routing summary") {
    val viaCatalog = Cdc.cdcCatalogRoute(spark, sf).collect()
    val direct = Cdc.cdcRoute(spark, sf).collect()
    assert(viaCatalog.toSeq === direct.toSeq,
      "catalog create/append round-trip lost or duplicated rows")
  }

  test("streaming foreachBatch route equals the derived-column summary " +
    "across create+append micro-batches") {
    val viaStream = graft.streaming.StreamQueries.streamCatalogRoute(spark, sf).collect()
    val direct = Cdc.cdcRoute(spark, sf).collect()
    assert(viaStream.toSeq === direct.toSeq,
      "streamed catalog route lost or duplicated rows across micro-batches")
  }

  test("tables are registered in a per-invocation database") {
    Cdc.cdcCatalogRoute(spark, sf).collect()
    val dbs = spark.catalog.listDatabases().collect()
      .map(_.name).filter(_.startsWith("graft_cdc_"))
    assert(dbs.nonEmpty, "no graft_cdc_* database registered")
    // filter to the db's own tables: listTables also returns session
    // temp views (database=null) created by other suites' operators
    val tables = spark.catalog.listTables(dbs.max).collect()
      .filter(_.database == dbs.max).map(_.name)
    assert(tables.length >= 2 && tables.forall(_.startsWith("commerce_")),
      s"unexpected catalog tables: ${tables.toSeq}")
    tables.foreach { t =>
      assert(spark.catalog.tableExists(s"`${dbs.max}`.`$t`"))
    }
  }
}

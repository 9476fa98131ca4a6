package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

/** Persistence + discovery for the optimizer-tier registries — the fix
  * for "the registry dies with the session": `register(...)` then
  * [[save]] records [[BloomJoins]] layouts, zone layouts and
  * [[SummaryViews]] views in a small `_graft_catalog.json` file BESIDE
  * the data (exactly where the `_bloomindex`/`_zonemap` manifests and
  * the summary state already live), and the rules DISCOVER it: the
  * first time a query plans over an unregistered path, the rule checks
  * once for a catalog file and loads it. A fresh session — including a
  * SQL-only user who has never heard of `register()` — then prunes plain
  * `spark.sql` over any previously-catalogued layout with zero setup.
  * [[graft.streaming.Destination]]'s `FileDestination` writes this
  * catalog itself when it maintains zone/bloom manifests, so streamed
  * layouts self-describe without any call at all.
  *
  * Cost discipline: discovery is one filesystem `exists` per DISTINCT
  * scanned root per session (hit or miss, the attempt is cached in
  * memory); every subsequent query pays a set lookup. A catalog written
  * by another process AFTER this session already probed the path is not
  * seen until [[load]] is called explicitly or a new session starts —
  * the same freshness contract as Spark's own FileIndex caching.
  *
  * Off switch: `spark.graft.catalog.autoload=false` disables discovery
  * (explicit `register()`/[[load]] calls keep working).
  */
object GraftCatalog {

  private val FileName = "_graft_catalog.json"

  private def norm(p: String): String = BloomJoins.norm(p)

  /** Roots already probed for a catalog this session (positive or
    * negative) — discovery never re-lists. */
  private val attempted =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Drop the discovery memory (NOT the registries): the next query
    * re-probes. Spec/fresh-session hook. */
  def clearCache(): Unit = attempted.clear()

  private val mapper = new ObjectMapper()

  /** Write the catalog for `root`: every CURRENTLY-registered bloom
    * layout, zone layout and summary view whose data path is `root`.
    * Call after `register(...)` to make the registration outlive the
    * session. Overwrites atomically (temp file + rename). */
  def save(spark: SparkSession, root: String): Unit = {
    val doc = mapper.createObjectNode()
    val blooms = doc.putArray("bloom")
    BloomJoins.layoutsFor(root).foreach { l =>
      val n = blooms.addObject()
      n.put("col", l.col)
      n.put("maxKeys", l.maxKeys)
    }
    val zs = doc.putArray("zones")
    BloomJoins.zoneLayoutsFor(root).foreach { z =>
      zs.addObject().put("col", z.col)
    }
    val vs = doc.putArray("views")
    SummaryViews.viewsFor(root).foreach { v =>
      val n = vs.addObject()
      n.put("statePath", v.statePath)
      strArr(n, "keyCols", v.keyCols)
      strArr(n, "sumCols", v.sumCols.toSeq.sorted)
      v.countCol.foreach(n.put("countCol", _))
      strMap(n, "nnCounts", v.nnCounts)
      strMap(n, "minCols", v.minCols)
      strMap(n, "maxCols", v.maxCols)
    }
    val (fs, rootPath) = graft.sources.Manifests.fsFor(spark, root)
    val target = new Path(rootPath, FileName)
    val tmp = new Path(rootPath, s".$FileName.tmp")
    val out = fs.create(tmp, true)
    out.write(mapper.writerWithDefaultPrettyPrinter()
      .writeValueAsBytes(doc))
    out.close()
    fs.delete(target, false)
    if (!fs.rename(tmp, target))
      throw new java.io.IOException(s"catalog rename failed: $target")
    // this session has by definition "attempted" the root — and found it
    attempted.add(norm(root))
  }

  private def strArr(n: ObjectNode, field: String, vs: Seq[String]): Unit = {
    val a = n.putArray(field)
    vs.foreach(a.add)
  }

  private def strMap(n: ObjectNode, field: String,
                     m: Map[String, String]): Unit = {
    val o = n.putObject(field)
    m.toSeq.sortBy(_._1).foreach { case (k, v) => o.put(k, v) }
  }

  /** Read the catalog at `root` (if any) and register its contents in
    * the in-memory registries. Returns true iff a catalog was loaded.
    * A malformed catalog is a REFUSAL, not a crash: the session keeps
    * planning plain scans, and the failure is counted on the metrics
    * registry (the [[BloomJoins.RefusalMetric]] discipline). */
  def load(spark: SparkSession, root: String): Boolean =
    try {
      val (fs, rootPath) = graft.sources.Manifests.fsFor(spark, root)
      val target = new Path(rootPath, FileName)
      if (!fs.exists(target)) false
      else {
        val in = fs.open(target)
        val doc =
          try mapper.readTree(in)
          finally in.close()
        arr(doc, "bloom").foreach { n =>
          BloomJoins.register(BloomJoins.Layout(root, n.get("col").asText(),
            if (n.has("maxKeys")) n.get("maxKeys").asInt() else 100000))
        }
        arr(doc, "zones").foreach { n =>
          BloomJoins.registerZone(
            BloomJoins.ZoneLayout(root, n.get("col").asText()))
        }
        arr(doc, "views").foreach { n =>
          SummaryViews.register(SummaryViews.View(
            root,
            n.get("statePath").asText(),
            strs(n, "keyCols"),
            strs(n, "sumCols").toSet,
            if (n.has("countCol")) Some(n.get("countCol").asText()) else None,
            nnCounts = pairs(n, "nnCounts"),
            minCols = pairs(n, "minCols"),
            maxCols = pairs(n, "maxCols")))
        }
        true
      }
    } catch {
      case e: Exception =>
        BloomJoins.refused(root, "catalog-load", e)
        false
    }

  private def arr(doc: JsonNode, field: String): Seq[JsonNode] =
    Option(doc.get(field)) match {
      case Some(a: ArrayNode) =>
        (0 until a.size()).map(a.get)
      case _ => Nil
    }

  private def strs(n: JsonNode, field: String): Seq[String] =
    arr(n, field).map(_.asText())

  private def pairs(n: JsonNode, field: String): Map[String, String] =
    Option(n.get(field)) match {
      case Some(o: ObjectNode) =>
        val it = o.properties().iterator()
        val b = Map.newBuilder[String, String]
        while (it.hasNext) {
          val e = it.next()
          b += e.getKey -> e.getValue.asText()
        }
        b.result()
      case _ => Map.empty
    }

  /** Discovery hook for the optimizer rules: probe each not-yet-attempted
    * root once. Steady-state cost per query is one set lookup per scanned
    * relation. */
  /** Test spy: filesystem probes actually made by discovery. */
  private[graft] val discoveryProbes =
    new java.util.concurrent.atomic.AtomicLong(0L)

  private[plans] def ensureDiscovered(spark: SparkSession,
                                      paths: Seq[String]): Unit = {
    if (!autoload(spark)) return
    paths.foreach { p =>
      val k = norm(p)
      if (!attempted.contains(k)) {
        attempted.add(k)
        discoveryProbes.incrementAndGet()
        load(spark, k)
      }
    }
  }

  private def autoload(spark: SparkSession): Boolean =
    spark.conf.get("spark.graft.catalog.autoload", "true") == "true"

  /** Remove the catalog file at `root` (registrations in memory stay). */
  def delete(spark: SparkSession, root: String): Unit = {
    val (fs, rootPath) = graft.sources.Manifests.fsFor(spark, root)
    fs.delete(new Path(rootPath, FileName), false)
    attempted.remove(norm(root))
  }
}

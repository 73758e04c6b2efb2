package graft.spatial.geom

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Way / relation geometry assembly (SURVEY.md J1/J2).
  *
  * The reference implies these joins by storing `refs`/`memids` as node
  * references (way.rs:21-23, relation.rs:26-32) but never executes them;
  * here they are declarative Spark joins so Catalyst plans them (sort-merge
  * with AQE skew handling at scale; broadcast when the dimension side is
  * small).
  */
object Assembly {

  /** ways × nodes → way_geoms(id, pts ARRAY<STRUCT<lon,lat>>, closed, tags).
    *
    * posexplode keeps ref order; re-aggregation sorts by position inside
    * the collected list, so the join itself needs no ordering guarantee.
    * Scale note: this is the one unavoidable big shuffle of the OSM side
    * (every way ref meets the node table); both sides hash-partition on
    * nodeId and partial aggregation is map-side. At 100 TB the node table
    * would be bucketed by id so this becomes a co-located join.
    */
  def wayGeometries(nodes: DataFrame, ways: DataFrame): DataFrame = {
    val refs = ways.select(col("id").as("way_id"), col("tags"),
      posexplode(col("refs")).as(Seq("pos", "node_id")))
    val pts = nodes.select(col("id").as("node_id"), col("lon"), col("lat"))
    refs.join(pts, "node_id")
      .groupBy(col("way_id").as("id"))
      .agg(
        first(col("tags")).as("tags"),
        sort_array(collect_list(struct(col("pos"), col("lon"), col("lat")))).as("ordered"))
      .select(
        col("id"),
        expr("transform(ordered, p -> struct(p.lon as lon, p.lat as lat))").as("pts"),
        col("tags"))
      .withColumn("closed",
        size(col("pts")) > 3 && col("pts").getItem(0) === element_at(col("pts"), -1))
  }

  private def bboxOf(ringsCol: Column): Column =
    // built from the PARAMETER (the old expr() strings hardcoded the
    // column name "rings", silently ignoring ringsCol). ONE fold with a
    // four-field struct accumulator (round-6): the previous four
    // independent `aggregate`s each re-flattened the rings and re-walked
    // every vertex — same least/greatest per element in the same order, so
    // the result is bit-identical, at a quarter of the vertex walks and a
    // quarter of the codegen.
    aggregate(flatten(ringsCol),
      struct(lit(180.0).as("min_lon"), lit(90.0).as("min_lat"),
        lit(-180.0).as("max_lon"), lit(-90.0).as("max_lat")),
      (a, p) => struct(
        least(a.getField("min_lon"), p.getField("lon")).as("min_lon"),
        least(a.getField("min_lat"), p.getField("lat")).as("min_lat"),
        greatest(a.getField("max_lon"), p.getField("lon")).as("max_lon"),
        greatest(a.getField("max_lat"), p.getField("lat")).as("max_lat")))

  /** Closed, polygon-tagged ways → single-ring polygons
    * (id, rings, tags, bbox — FIXTURES.md §B `polygons` schema). */
  def polygonsFromWays(wayGeoms: DataFrame,
      polygonTagKeys: Seq[String] = Seq("building", "landuse", "natural", "leisure", "amenity")): DataFrame = {
    val isPolyTag = polygonTagKeys.map(k => map_contains_key(col("tags"), k))
      .reduce(_ || _)
    wayGeoms
      .where(col("closed") && isPolyTag)
      .select(col("id"), array(col("pts")).as("rings"), col("tags"))
      .withColumn("bbox", bboxOf(col("rings")))
  }

  /** Multipolygon relations → polygons with outer + inner rings (J2).
    *
    * Depth ≤ 2: members of type `relation` (reference member_type.rs:4-8
    * `MemberType::Relation`, relation.rs:26-33 — route masters, boundary
    * super-relations) contribute the WAY members of the referenced relation,
    * with the sub-members' own roles. The resolve is ONE static join, never
    * a recursion — so the depth cap is structural and relation cycles
    * (A→B→A, or A→A) cannot loop: a deeper nesting level is simply not
    * expanded, and duplicate (way, role) contributions collapse. Outer
    * rings sort before inner (then by way id — deterministic for relations
    * with several outer rings) so even-odd PIP sees a consistent ring order
    * (the test itself is order-independent).
    */
  def polygonsFromRelations(relations: DataFrame, wayGeoms: DataFrame): DataFrame = {
    val m0 = relations
      .where(element_at(col("tags"), "type") === "multipolygon")
      .select(col("id").as("rel_id"), col("tags"), explode(col("members")).as("m"))
    val direct = m0
      .where(col("m.mtype") === "way" && col("m.role").isin("outer", "inner"))
      .select(col("rel_id"), col("tags"), col("m.memid").as("way_id"), col("m.role").as("role"))
    // super-relation members: pull the referenced relation's way members
    // (any sub-relation type — a boundary sub-relation still contributes
    // its rings to a multipolygon super)
    val subRefs = m0
      .where(col("m.mtype") === "relation")
      .select(col("rel_id"), col("tags"), col("m.memid").as("sub_id"))
    val subWayMembers = relations
      .select(col("id").as("sub_id"), explode(col("members")).as("sm"))
      .where(col("sm.mtype") === "way" && col("sm.role").isin("outer", "inner"))
      .select(col("sub_id"), col("sm.memid").as("way_id"), col("sm.role").as("role"))
    val viaSub = subRefs.join(subWayMembers, "sub_id")
      .select(col("rel_id"), col("tags"), col("way_id"), col("role"))
    val members = direct.unionByName(viaSub).dropDuplicates("rel_id", "way_id", "role")
    members
      .join(wayGeoms.select(col("id").as("way_id"), col("pts")), "way_id")
      .groupBy(col("rel_id").as("id"))
      .agg(
        first(col("tags")).as("tags"),
        expr("transform(sort_array(collect_list(struct(case when role = 'outer' then 0 else 1 end as r, way_id as w, pts))), x -> x.pts)")
          .as("rings"))
      .withColumn("bbox", bboxOf(col("rings")))
      .select("id", "rings", "tags", "bbox")
  }

  /** Unified polygon table: way polygons ∪ relation multipolygons.
    * Way ids and relation ids share a namespace in OSM only per-type, so a
    * `src` discriminator keeps them unique.
    *
    * The intermediate way-geometry table is cached because BOTH branches of
    * the union consume it; the cache lives until the session drops it (or
    * the caller materializes the result — e.g. `localCheckpoint()` — and
    * calls `spark.catalog.clearCache()`). Polygon geometry is the SMALL
    * side at planet scale (~10⁷ polygons vs 10¹² images), so a session-
    * lifetime cache of it is the intended steady state. */
  def polygons(nodes: DataFrame, ways: DataFrame, relations: DataFrame): DataFrame = {
    val wg = wayGeometries(nodes, ways).cache()
    val fromWays = polygonsFromWays(wg).withColumn("src", lit("way"))
    val fromRels = polygonsFromRelations(relations, wg).withColumn("src", lit("relation"))
    // round-6 note: caching the assembled union here was TRIED and
    // reverted — single-evaluation consumers (the p4/p5-shaped queries)
    // paid ~+0.4 s building + columnar-reading the nested ring arrays for
    // nothing, while the only genuine multi-evaluation consumer (the
    // streaming graft's per-micro-batch static side) is better served by a
    // caller-scoped localCheckpoint it can free when the stream drains.
    fromWays.unionByName(fromRels)
  }
}

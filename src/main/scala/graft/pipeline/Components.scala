package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Connected components over near-duplicate candidate pairs.
  *
  * Pairwise dedup (MinHash/SimHash/cosine) yields EDGES; a real pipeline
  * needs CLUSTERS — transitive closure — so that "keep one doc per
  * duplicate set" survives chains (a~b, b~c but a!~c must still collapse
  * to one representative).
  *
  * Algorithm: the alternating large-star/small-star of Kiveris et al.,
  * "Connected Components in MapReduce and Beyond" (SoCC'14) — the
  * published shuffle-only formulation that converges in O(log n) rounds
  * with per-round cost linear in the edge count, no driver-side graph
  * state (unlike label propagation, whose round count is the graph
  * DIAMETER — a 1M-doc duplicate chain would need 1M rounds; this needs
  * ~20). Each round is two self-describing DataFrame jobs: the only
  * driver action is the fixed-point check on an aggregate signature.
  *
  * Edge orientation invariant: after any small-star round the edge set is
  * (child -> parent) with parent < child; at the fixed point it is a star
  * forest: every node points directly at its component's minimum id.
  */
object Components {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** (id, component) for every node appearing in `edges`, where
    * `component` = the smallest node id in the node's connected component.
    * Input columns: (id1, id2); ids must be orderable (long/int/string). */
  def connectedComponents(edges: DataFrame, id1: String = "id1", id2: String = "id2",
                          maxIter: Int = 25): DataFrame =
    connectedComponentsWithStats(edges, id1, id2, maxIter)._1

  /** As [[connectedComponents]], plus convergence telemetry: (labels,
    * rounds run, converged?). Rounds-to-converge is the regression canary
    * for corpus-shape drift — the star-forest fixed point is O(log n)
    * rounds, so a round-count jump means the candidate graph changed
    * shape, not just size. */
  def connectedComponentsWithStats(edges: DataFrame, id1: String = "id1", id2: String = "id2",
                                   maxIter: Int = 25): (DataFrame, Int, Boolean) = {
    // checkpoint the edge input once: it is typically an EXPENSIVE dedup
    // candidate pipeline (MinHash LSH + verify), and it feeds both the
    // iteration seed and the final node-labeling join — without the
    // barrier it would re-execute end-to-end for each consumer
    val edges0 = edges.select(col(id1).as("u"), col(id2).as("v"))
      .localCheckpoint(false)
    val nodes = edges0.select(col("u"))
      .union(edges0.select(col("v").as("u"))).distinct()

    var e = edges0
      .where(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .distinct()

    var converged = false
    var it = 0
    var prevSig: (Long, Long) = (-1L, -1L)
    while (!converged && it < maxIter) {
      val ls = largeStar(e)
      // lazy localCheckpoint: the signature action below materializes it,
      // truncating the O(log n)-deep lineage at ONE Spark job per round
      val ss = smallStar(ls).localCheckpoint(false)
      // fixed point <=> the (count, order-independent hash) signature repeats;
      // at the star forest both large-star and small-star are identity maps
      val sigRow = ss.agg(count(lit(1)), sum(xxhash64(col("u"), col("v")))).head()
      val sig = (sigRow.getLong(0), if (sigRow.isNullAt(1)) 0L else sigRow.getLong(1))
      converged = sig == prevSig
      prevSig = sig
      e = ss
      it += 1
    }
    // `converged` flags the signature REPEATING, i.e. the round after the
    // fixed point was reached: rounds-to-converge = it - 1.
    if (converged)
      log.info(s"connectedComponents converged after ${it - 1} rounds (+1 confirm)")
    else
      log.warn(s"connectedComponents did NOT reach the star-forest fixed point " +
        s"within maxIter=$maxIter rounds; labels below are min-aggregated and " +
        s"may over-segment components")
    // min-aggregate the labeling: at the fixed point each node has exactly
    // one outgoing edge so this is a no-op, but on a maxIter bail-out a
    // node can still hold several parents — without the min() the join
    // would emit duplicate (id, component) rows with conflicting labels
    val labels = nodes
      .join(e.select(col("u"), col("v").as("__comp")), Seq("u"), "left")
      .groupBy(col("u"))
      .agg(min(coalesce(col("__comp"), col("u"))).as("component"))
      .select(col("u").as("id"), col("component"))
    (labels, it, converged)
  }

  /** INCREMENTAL connected components: fold a batch of new edges into an
    * existing (id, component) assignment without recomputing the corpus.
    *
    * The batch graph is CONTRACTED before any iteration: each endpoint
    * maps to its current component label (new nodes keep their own id),
    * so the star-forest loop runs over a graph with ONE node per touched
    * component — never over the components' members. Because a label is
    * by construction its component's minimum member id, the contracted
    * fixed point's label for a merged cluster is the true minimum over
    * every member, so relabeling the standing assignment through the
    * (old label → final label) map reproduces the full recompute exactly
    * and repeated folds compose. Batch edges that land inside one
    * existing component contract to self-loops and vanish — the standing
    * service's steady state runs zero iteration rounds.
    *
    * Scale shape: cost is batch-proportional — the assignment is scanned
    * (never shuffled on members) by the two endpoint-label lookups and
    * the final relabel, the iteration input is |touched components| +
    * |new nodes| rows, and new-node detection reuses the lookup's null
    * slots instead of an extra corpus anti-join. Touched-component SIZE
    * no longer matters (pre-r10 the members re-entered the loop).
    * Labels for nodes in NO edge ever (singletons) are the caller's to
    * add, as with [[connectedComponents]]. */
  def incrementalComponents(assign: DataFrame, newEdges: DataFrame,
                            id1: String = "id1", id2: String = "id2",
                            idCol: String = "id", compCol: String = "component",
                            maxIter: Int = 25): DataFrame = {
    // fast path: the common COLLISION-FREE batch (the standing near-dup
    // service's steady state finds no new pairs) — nothing to fold.
    // checkpoint first: `newEdges` is typically an expensive probe
    // pipeline, and the emptiness test plus the lookups below would each
    // re-derive it
    val edges0 = newEdges.select(col(id1), col(id2)).localCheckpoint(false)
    if (edges0.isEmpty) return assign.select(col(idCol), col(compCol))
    // endpoint → current label lookups (null = brand-new node)
    val a1 = assign.select(col(idCol).as(id1), col(compCol).as("__c1"))
    val a2 = assign.select(col(idCol).as(id2), col(compCol).as("__c2"))
    val tagged = edges0.join(a1, Seq(id1), "left").join(a2, Seq(id2), "left")
      .localCheckpoint(false)
    val contracted = tagged
      .select(coalesce(col("__c1"), col(id1)).as(id1),
              coalesce(col("__c2"), col(id2)).as(id2))
      .where(col(id1) =!= col(id2))
    // brand-new nodes: the lookup's null slots — no corpus anti-join
    val newIds = tagged.where(col("__c1").isNull).select(col(id1).as("__old"))
      .union(tagged.where(col("__c2").isNull).select(col(id2).as("__old")))
      .distinct()
    // second fast path: every batch edge contracted to a self-loop (all
    // intra-component) — assignment unchanged; any new node here can only
    // have self-loop edges, so it labels itself (lazy union: empty in the
    // typical redundant-edges batch)
    if (contracted.isEmpty)
      return assign.select(col(idCol), col(compCol))
        .unionByName(newIds.select(col("__old").as(idCol), col("__old").as(compCol)))
    // star-forest over the contracted graph: nodes are old labels and
    // new-node ids; `merged` maps each to the final (minimum) label
    val merged = connectedComponents(contracted, id1, id2, maxIter)
      .toDF("__old", "__new").localCheckpoint(false)
    val relabel = merged.where(col("__old") =!= col("__new"))
      .withColumnRenamed("__old", compCol)
    val updated = assign
      .join(relabel, Seq(compCol), "left")
      .select(col(idCol), coalesce(col("__new"), col(compCol)).as(compCol))
    // a new node missing from `merged` had only self-loop edges: label it
    // as itself, like the full recompute would
    val newNodes = newIds.join(merged, Seq("__old"), "left")
      .select(col("__old").as(idCol),
              coalesce(col("__new"), col("__old")).as(compCol))
    updated.unionByName(newNodes)
  }

  /** Large-star: for every node u, connect every LARGER neighbor to the
    * minimum of u's neighborhood (including u). Keeps (child > parent)
    * edges only; strictly reduces the depth of tall trees.
    *
    * The per-neighborhood minimum is a WINDOW aggregate, not a
    * groupBy+self-join: one hash-partition shuffle on u instead of two
    * (aggregate exchange + join exchange) — at corpus scale that halves
    * the round's shuffled bytes, and at bench-fixture scale it halves the
    * sequential tiny-job count that dominated q164's warm cost (r10).
    * No trailing distinct either: small-star's neighborhood min is
    * multiplicity-blind, and ITS distinct bounds the edge set once per
    * round — duplicate large-star rows only pad one shuffle's input. */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
    val w = Window.partitionBy(col("u"))
    sym.withColumn("__mn", least(min(col("v")).over(w), col("u")))
      .where(col("v") > col("u"))
      .select(col("v").as("u"), col("__mn").as("v"))
      .where(col("u") =!= col("v"))
  }

  /** Small-star: for every node u (edges oriented child->parent, v < u),
    * connect u and all its smaller neighbors to the smallest of them.
    * Same single-shuffle window formulation as [[largeStar]]; the two
    * union branches share the windowed exchange (ReusedExchange), and the
    * per-u parent rows ride the final distinct instead of a separate
    * aggregate. */
  private def smallStar(e: DataFrame): DataFrame = {
    val oriented = e.select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
    val w = Window.partitionBy(col("u"))
    val m = oriented.withColumn("__mn", min(col("v")).over(w))
    m.select(col("v").as("u"), col("__mn").as("v"))
      .union(m.select(col("u"), col("__mn").as("v")))
      .where(col("u") =!= col("v"))
      .distinct()
  }

  /** Cluster-aware dedup: keep exactly one representative (the minimum id)
    * per connected component of `pairs`, plus every unpaired doc. */
  def keepRepresentatives(docs: DataFrame, pairs: DataFrame, idCol: String = "doc_id",
                          id1: String = "id1", id2: String = "id2"): DataFrame = {
    val comp = connectedComponents(pairs, id1, id2)
    val drop = comp.where(col("id") =!= col("component")).select(col("id").as(idCol))
    docs.join(drop, Seq(idCol), "left_anti")
  }
}

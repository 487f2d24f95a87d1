package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
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
    * Only components TOUCHED by the batch recompute: assignments whose
    * component contains an endpoint of a new edge re-enter the star-forest
    * iteration as (id → component) edges alongside the new edges (a
    * component's label is by construction its minimum member, so those
    * edges reproduce its connectivity exactly); every untouched
    * assignment passes through unchanged. A batch endpoint unknown to the
    * assignment is a brand-new node and simply rides the new edges.
    *
    * Scale shape: two semi-joins restrict the recompute seed to
    * touched-component rows (batch-proportional for the typical
    * few-collisions batch — the standing near-dup service shape), and the
    * log-round iteration runs over that seed, not the corpus. The merged
    * result keeps the invariant `component = min member id`, so repeated
    * folds compose. Labels for nodes in NO edge ever (singletons) are the
    * caller's to add, as with [[connectedComponents]]. */
  def incrementalComponents(assign: DataFrame, newEdges: DataFrame,
                            id1: String = "id1", id2: String = "id2",
                            idCol: String = "id", compCol: String = "component",
                            maxIter: Int = 25): DataFrame = {
    // fast path: the common COLLISION-FREE batch (the standing near-dup
    // service's steady state finds no new pairs) — no edges means no
    // touched components and no new nodes; skip the star-forest loop's
    // ~10 fixed-overhead jobs entirely and return the assignment as-is.
    // checkpoint first: `newEdges` is typically an expensive probe
    // pipeline, and the emptiness test plus the seed union below would
    // each re-derive it
    val edges0 = newEdges.select(col(id1), col(id2)).localCheckpoint(false)
    if (edges0.isEmpty) return assign.select(col(idCol), col(compCol))
    val ends = edges0.select(col(id1).as(idCol))
      .union(edges0.select(col(id2).as(idCol))).distinct()
    val touchedComps = assign.join(ends, Seq(idCol), "left_semi")
      .select(col(compCol)).distinct().localCheckpoint(false)
    // second fast path: every batch endpoint is NEW (no touched standing
    // components) — the recompute seed is just the batch's own edges, so
    // skip the two corpus-side joins and pass the assignment through
    val anyTouched = !touchedComps.isEmpty
    val seed =
      if (anyTouched)
        assign.join(touchedComps, Seq(compCol), "left_semi")
          .select(col(idCol).as(id1), col(compCol).as(id2))
          .unionByName(edges0)
      else edges0
    val recomputed = connectedComponents(seed, id1, id2, maxIter)
      .toDF(idCol, compCol)
    val untouched =
      if (anyTouched) assign.join(touchedComps, Seq(compCol), "left_anti")
      else assign
    untouched.select(col(idCol), col(compCol)).unionByName(recomputed)
  }

  /** Large-star: for every node u, connect every LARGER neighbor to the
    * minimum of u's neighborhood (including u). Keeps (child > parent)
    * edges only; strictly reduces the depth of tall trees. */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
    val mins = sym.groupBy("u").agg(min(col("v")).as("__mn"))
    sym.join(mins, "u")
      .where(col("v") > col("u"))
      .select(col("v").as("u"), least(col("__mn"), col("u")).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
  }

  /** Small-star: for every node u (edges oriented child->parent, v < u),
    * connect u and all its smaller neighbors to the smallest of them. */
  private def smallStar(e: DataFrame): DataFrame = {
    val oriented = e.select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
    val mins = oriented.groupBy("u").agg(min(col("v")).as("__mn"))
    oriented.join(mins, "u")
      .select(col("v").as("u"), col("__mn").as("v"))
      .union(mins.select(col("u"), col("__mn").as("v")))
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

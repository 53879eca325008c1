package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{ArrayFilter, RLike}
import org.apache.spark.sql.catalyst.plans.logical.Filter
import graft.models.TextMarts
import graft.sources.Tables

/** Regression guards for the round-2 plan pathologies (docs/SCALE.md "Plan
  * pathologies"): if a refactor swaps explode_outer back to explode, the
  * inferred size>0 filter re-inlines the whole regex battery into a per-row
  * Filter (measured 3x); if a HOF sneaks into the battery projection, the
  * rlike chain drops out of whole-stage codegen. Assert on the optimized
  * logical plan, where both regressions are visible structurally.
  */
class PlanAuditSpec extends SparkTestBase {

  private def rlikeFilters(df: DataFrame): Seq[Filter] =
    df.queryExecution.optimizedPlan.collect {
      case f: Filter if f.condition.find(_.isInstanceOf[RLike]).isDefined => f
    }

  private def arrayFilterCount(df: DataFrame): Int =
    df.queryExecution.optimizedPlan
      .flatMap(_.expressions.flatMap(_.collect { case a: ArrayFilter => a })).size

  test("FDA battery: no RLIKE inside Filter nodes (regexes evaluate once)") {
    val df = TextMarts.fctFdaEventsByReaction(TextMarts.fdaEvents(Tables.events(spark, sf)))
    assert(rlikeFilters(df).isEmpty,
      "InferFiltersFromGenerate re-inlined the symptom battery into a Filter")
  }

  test("HN battery: no RLIKE inside Filter nodes, no HOF in the match plan") {
    val kw = TextMarts.intHnKeywords(Tables.documents(spark, sf))
    assert(rlikeFilters(kw).isEmpty,
      "InferFiltersFromGenerate re-inlined the keyword battery into a Filter")
    assert(arrayFilterCount(kw) == 0,
      "a filter() HOF in the keyword match plan forces interpreted eval")
  }

  test("FDA fct: no HOF in the category-array plan") {
    val df = TextMarts.fctFdaEventsByReaction(TextMarts.fdaEvents(Tables.events(spark, sf)))
    assert(arrayFilterCount(df) == 0,
      "a filter() HOF in the category plan forces interpreted eval")
  }

  private def withoutAqe[T](body: => T): T = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("rank-limit rewrite fires for every query that depends on it") {
    import graft.plans.TopKPerKeyExec
    import org.apache.spark.sql.execution.window.WindowExec
    withoutAqe {
      // the three registry queries whose 100-TB story is the TopKPerKey plan
      // (bounded heaps, no per-partition sort) — a refactor that stops the
      // rewrite from matching silently reverts them to sort-the-world
      val targets: Seq[(String, DataFrame)] = Seq(
        "win_topk_group" -> graft.operators.Windows.winTopkGroup(Tables.lineitem(spark, sf)),
        "cap_per_source" -> graft.operators.Curation.capPerSource(Tables.documents(spark, sf)),
        "dedup_keep_best" -> graft.operators.Dedup.dedupKeepBest(Tables.documents(spark, sf)),
        "knn_graph" -> graft.operators.Similarity.knnGraph(Tables.embeddings(spark, sf)),
        "agg_mode" -> graft.operators.Aggregates.aggMode(Tables.orders(spark, sf)),
        "dedup_semantic" -> graft.operators.Similarity.dedupSemantic(Tables.embeddings(spark, sf)),
        "mine_hard_negatives" -> graft.operators.Similarity.mineHardNegatives(Tables.embeddings(spark, sf)),
        "sample_reservoir_weighted" -> graft.operators.Curation.sampleReservoirWeighted(Tables.documents(spark, sf)))
      targets.foreach { case (name, df) =>
        val plan = df.queryExecution.executedPlan
        val topks = plan.collect { case t: TopKPerKeyExec => t }
        assert(topks.size >= 2, s"$name lost the TopKPerKey rewrite:\n$plan")
        // other window shapes may legitimately remain (dedup_keep_best keeps
        // a cluster-size count window); what must be gone is the rank window
        // the rewrite replaces
        val rankWindows = plan.collect {
          case w: WindowExec if w.windowExpression.exists(
            _.find(_.isInstanceOf[org.apache.spark.sql.catalyst.expressions.RowNumber])
              .isDefined) => w
        }
        assert(rankWindows.isEmpty,
          s"$name still plans a row_number WindowExec alongside TopKPerKey:\n$plan")
      }
      // sensitivity: the same assertion FAILS when the rewrite is disabled
      // (rewriteMaxK=0 declines every match) — proves the guard can detect
      // a broken rewrite rather than passing vacuously
      spark.conf.set("spark.graft.topk.rewriteMaxK", "0")
      try {
        val broken = graft.operators.Windows.winTopkGroup(Tables.lineitem(spark, sf))
        assert(broken.queryExecution.executedPlan
          .collect { case t: TopKPerKeyExec => t }.isEmpty,
          "rewriteMaxK=0 should disable the rewrite; the guard would be vacuous")
      } finally spark.conf.unset("spark.graft.topk.rewriteMaxK")
    }
  }

  test("hot text/dedup pipelines stay fully codegen (no CodegenFallback expressions)") {
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    withoutAqe {
      // queries whose per-row cost dominates at 100 TB: a fallback expression
      // here drops the whole projection out of whole-stage codegen (measured
      // 3x on the HOF dot product before RewriteHofDotProduct)
      val hot: Seq[(String, DataFrame)] = Seq(
        "text_fingerprint" -> graft.operators.TextAnalysis.textFingerprint(Tables.documents(spark, sf)),
        "text_token_count" -> graft.operators.TextAnalysis.textTokenCount(Tables.documents(spark, sf)),
        "text_langid" -> graft.operators.TextAnalysis.textLangid(Tables.documents(spark, sf)),
        "dedup_minhash_lsh_fast" -> graft.operators.Dedup.dedupMinhashLsh(
          Tables.documents(spark, sf), fastHash = true),
        "dedup_simhash_fast" -> graft.operators.Dedup.dedupSimhash(
          Tables.documents(spark, sf), fastHash = true),
        "embed_norm_stats" -> graft.operators.CorpusStats.embedNormStats(
          Tables.embeddings(spark, sf)))
      hot.foreach { case (name, df) =>
        val fallbacks = df.queryExecution.executedPlan.flatMap(
          _.expressions.flatMap(_.collect { case e: CodegenFallback => e }))
        assert(fallbacks.isEmpty,
          s"$name has CodegenFallback expressions ${fallbacks.map(_.getClass.getSimpleName).distinct}")
      }
    }
  }

  test("financial window ops cost at most one exchange beyond the prices adapter") {
    import org.apache.spark.sql.execution.exchange.Exchange
    withoutAqe {
      // the adapter's (ticker, date) groupBy is one exchange; each operator
      // claims to add at most ONE more (its ticker partitioning), with the
      // window and any final aggregate sharing it
      val targets: Seq[(String, DataFrame)] = Seq(
        "win_twap" -> graft.operators.Windows.winTwap(Tables.prices(spark, sf)),
        "win_drawdown" -> graft.operators.Windows.winDrawdown(Tables.prices(spark, sf)),
        "win_rsi" -> graft.operators.Windows.winRsi(Tables.prices(spark, sf)),
        "win_volatility" -> graft.operators.Windows.winVolatility(Tables.prices(spark, sf)),
        "agg_ohlc_weekly" -> graft.operators.Windows.aggOhlcWeekly(Tables.prices(spark, sf)))
      targets.foreach { case (name, df) =>
        val exchanges = df.queryExecution.executedPlan.collect { case e: Exchange => e }
        assert(exchanges.size <= 2,
          s"$name grew beyond adapter + one exchange:\n${df.queryExecution.executedPlan}")
      }
    }
  }

  test("dag_full_build shares staging subtrees: fewer exchanges than the models planned separately") {
    import org.apache.spark.sql.execution.exchange.{Exchange, ReusedExchangeExec}
    withoutAqe {
      // the one-program DAG must plan LESS total shuffle machinery than the
      // 16 models planned as separate queries — otherwise composing the
      // lifecycle into one plan bought nothing (Dag scaladoc: prices feeds
      // two stock marts, the sales join feeds two Iowa marts, the FDA/HN
      // stagings feed two models each)
      val dagPlan = SparkEntry.queries("dag_full_build")(spark, sf)
        .queryExecution.executedPlan
      val dagExchanges = dagPlan.collect { case e: Exchange => e }.size
      val reused = dagPlan.collect { case r: ReusedExchangeExec => r }.size
      // fair comparison: the same digest-wrapped models planned as ~45
      // separate queries (the digest aggregate itself costs an exchange per
      // model, so comparing against the bare models would overstate)
      val separate = (graft.models.Dag.digestCols.map { case (name, cols) =>
        graft.models.Dag.digestRow(name, SparkEntry.queries(name)(spark, sf), cols)
          .queryExecution.executedPlan.collect { case e: Exchange => e }.size
      } ++ graft.models.StagingModels.census.map { e =>
        graft.models.Dag.digestRow(e.name, e.build(spark, sf), e.digest)
          .queryExecution.executedPlan.collect { case ex: Exchange => ex }.size
      }).sum
      assert(reused > 0, s"no ReusedExchange in the DAG plan")
      assert(dagExchanges < separate,
        s"one-program DAG planned $dagExchanges exchanges vs $separate separate " +
          s"(reused=$reused) — shared staging did not collapse")
      // the narrow shared stages (no shuffle boundary to reuse) collapse via
      // CacheScope instead: at least one cached stage must be scanned by
      // more than one model in the single plan
      import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
      val scansPerCache = dagPlan.collect { case s: InMemoryTableScanExec =>
        System.identityHashCode(s.relation.cacheBuilder)
      }.groupBy(identity).map(_._2.size)
      assert(scansPerCache.exists(_ >= 2),
        s"no staged frame is shared across models in the DAG plan")
    }
  }

  test("dsir + domain mix plan: no exchange ever carries text or score arrays") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    withoutAqe {
      val docs = Tables.documents(spark, sf)
      // dsir_train's only shuffles are the D-bounded bucket aggregate and
      // the single-row totals; mix_plan_by_domain's are the
      // |domains|-bounded per-domain aggregates (the frozen-model assign
      // itself is a pure projection). None may carry corpus text, gram
      // arrays, or the per-doc score columns.
      for (df <- Seq(graft.operators.Curation.dsirTrain(docs),
        graft.operators.TextAnalysis.mixPlanByDomain(docs))) {
        val exchanges = df.queryExecution.executedPlan.collect {
          case e: ShuffleExchangeExec => e
        }
        assert(exchanges.nonEmpty)
        exchanges.foreach { e =>
          val shuffled = e.child.output.map(_.name)
          assert(!shuffled.exists(n =>
            n == "text" || n == "gram" || n == "dom_sums" || n == "sum_r"),
            s"corpus-sized column crosses an exchange: $shuffled")
        }
      }
    }
  }

  test("pipeline_pretrain_shards joins stay broadcast (no sort-merge, no nested-loop)") {
    import org.apache.spark.sql.execution.joins.{SortMergeJoinExec, BroadcastNestedLoopJoinExec}
    withoutAqe {
      val plan = graft.operators.Pipeline.pretrainShards(Tables.documents(spark, sf))
        .queryExecution.executedPlan
      val smj = plan.collect { case j: SortMergeJoinExec => j }
      val bnl = plan.collect { case j: BroadcastNestedLoopJoinExec => j }
      assert(smj.isEmpty && bnl.isEmpty,
        s"pretrain pipeline lost its broadcast-only join shape:\n$plan")
    }
  }

  test("pipeline_model_curation: scoring adds no exchange beyond the dedup skeleton") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.{SortMergeJoinExec, BroadcastNestedLoopJoinExec}
    withoutAqe {
      val docs = Tables.documents(spark, sf)
      val plan = graft.operators.Pipeline.modelCuration(docs)
        .queryExecution.executedPlan
      assert(plan.collect { case j: SortMergeJoinExec => j }.isEmpty &&
        plan.collect { case j: BroadcastNestedLoopJoinExec => j }.isEmpty,
        s"model curation lost its broadcast-only join shape:\n$plan")
      // the broadcast-model scoring is a pure projection: the pipeline's
      // only shuffles are the exact-dedup digest leg and the final
      // per-source aggregate — the same count the unscored skeleton pays
      val skeleton = docs
        .join(graft.operators.Dedup.dedupExact(docs)
          .select(org.apache.spark.sql.functions.col("keeper_doc_id").as("doc_id")),
          Seq("doc_id"), "left_semi")
        .groupBy("source").count()
        .queryExecution.executedPlan
      def shuffles(p: org.apache.spark.sql.execution.SparkPlan) =
        p.collect { case e: ShuffleExchangeExec => e }.size
      assert(shuffles(plan) == shuffles(skeleton),
        s"scoring added a shuffle: pipeline=${shuffles(plan)} skeleton=${shuffles(skeleton)}")
    }
  }

  test("chunk_fixed_tokens plans with ZERO exchanges (pure per-document explode)") {
    import org.apache.spark.sql.execution.exchange.Exchange
    withoutAqe {
      val df = graft.operators.Curation.chunkFixedTokens(Tables.documents(spark, sf))
      val exchanges = df.queryExecution.executedPlan.collect { case e: Exchange => e }
      assert(exchanges.isEmpty,
        s"chunking must stay shuffle-free:\n${df.queryExecution.executedPlan}")
    }
  }

  test("k-means assignment plans through CentroidArgmin, not least-of-structs") {
    import graft.functions.CentroidArgmin
    withoutAqe {
      // a refactor back to the struct encoding silently reintroduces the
      // janino unit whose compilation dominated sim_search_pq's wall clock
      val targets: Seq[(String, DataFrame)] = Seq(
        "embed_pq" -> graft.operators.Similarity.embedPq(Tables.embeddings(spark, sf)),
        "embed_kmeans" -> graft.operators.Similarity.embedKmeans(Tables.embeddings(spark, sf)),
        "sim_search_pq" -> graft.operators.Similarity.simSearchPq(Tables.embeddings(spark, sf)))
      targets.foreach { case (name, df) =>
        val plan = df.queryExecution.executedPlan
        val native = plan.flatMap(_.expressions.flatMap(
          _.collect { case e: CentroidArgmin => e }))
        assert(native.nonEmpty, s"$name lost the CentroidArgmin assignment:\n$plan")
      }
    }
  }

  test("sample_bottomk plans as a bounded top-k, never a global sort") {
    import org.apache.spark.sql.execution.{SortExec, TakeOrderedAndProjectExec}
    withoutAqe {
      val df = graft.operators.Curation.sampleBottomK(Tables.documents(spark, sf))
      val plan = df.queryExecution.executedPlan
      assert(plan.collect { case t: TakeOrderedAndProjectExec => t }.nonEmpty,
        s"bottom-k must plan as TakeOrderedAndProject (per-partition heaps):\n$plan")
      assert(plan.collect { case s: SortExec => s }.isEmpty,
        s"bottom-k must not plan a full sort:\n$plan")
    }
  }

  test("contamination_bloom keeps the might_contain prefilter below the join") {
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    withoutAqe {
      val df = graft.operators.Curation.contaminationBloom(Tables.documents(spark, sf))
      val plan = df.queryExecution.executedPlan
      val joins = plan.collect { case j: BaseJoinExec => j }
      assert(joins.nonEmpty, s"exact-confirm join missing:\n$plan")
      // the bloom predicate must survive optimization INSIDE the join's
      // streamed (corpus) subtree — pruning before the join is the operator
      val prefiltered = joins.exists(_.children.exists(_.find(n =>
        n.expressions.exists(_.find(_.isInstanceOf[BloomFilterMightContain]).isDefined))
        .isDefined))
      assert(prefiltered, s"might_contain was optimized out or hoisted above the join:\n$plan")
    }
  }

  test("shard_shuffle plans exactly one exchange (rank window reuses the shard partitioning)") {
    withoutAqe {
      val df = graft.operators.Curation.shardShuffle(Tables.documents(spark, sf))
      val exchanges = df.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.size == 1,
        s"expected one hash(shard) exchange; got ${exchanges.size}:\n" +
          df.queryExecution.executedPlan)
    }
  }

  test("mm_content_dedup never shuffles payload bytes") {
    withoutAqe {
      val df = graft.operators.Multimodal.mmContentDedup(Tables.documents(spark, sf))
      val exchanges = df.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.nonEmpty)
      exchanges.foreach { e =>
        val shuffled = e.child.output.map(_.name)
        assert(!shuffled.exists(n => n == "payload" || n == "text"),
          s"payload bytes cross the exchange: $shuffled")
      }
    }
  }

  test("top-terms sketch: one exchange, object-hash aggregate, no per-term shuffle") {
    import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
    withoutAqe {
      val df = graft.operators.TextAnalysis.textTopTermsSketch(Tables.documents(spark, sf))
      val plan = df.queryExecution.executedPlan
      val exchanges = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.size == 1,
        s"sketch must shuffle once on the group key only:\n$plan")
      // TypedImperativeAggregate plans as ObjectHashAggregate (partial +
      // final) — a SortAggregate here would mean a per-group sort crept in
      assert(plan.collect { case a: ObjectHashAggregateExec => a }.size == 2,
        s"expected partial+final ObjectHashAggregate:\n$plan")
      // the shuffle carries one serialized buffer per (task, group), never
      // per-term rows: the exchange child's output is the agg buffer schema
      val shuffled = exchanges.head.child.output.map(_.name).mkString(",")
      assert(!shuffled.contains("term"), s"per-term rows cross the exchange: $shuffled")
    }
  }

  test("sessionize_batch plans exactly one exchange (groupBy reuses the window's partitioning)") {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = graft.streaming.Sessionize.sessionizeBatch(Tables.events(spark, sf))
      val exchanges = df.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.size == 1,
        s"expected hash(user_id) to satisfy groupBy(user_id, session_idx); got " +
          s"${exchanges.size} exchanges:\n${df.queryExecution.executedPlan}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("ts_gapfill reads the corpus at most once (spine derives from the cached counts)") {
    withoutAqe {
      val df = graft.operators.Reshape.tsGapfill(Tables.events(spark, sf))
      // three consumers (bounds, type dim, fill join) must all resolve to
      // the scope-cached counts frame — a raw events relation appearing
      // more than once means the calendar spine went back to the corpus
      val rawScans = df.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
      }
      assert(rawScans.size <= 1,
        s"expected at most one raw corpus scan, got ${rawScans.size}:\n" +
          df.queryExecution.optimizedPlan)
    }
  }

  test("sim_search_ivfpq serves broadcast-only (no sort-merge join, native assignment)") {
    import graft.functions.CentroidArgmin
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    withoutAqe {
      val df = graft.operators.Similarity.simSearchIvfPq(Tables.embeddings(spark, sf))
      val plan = df.queryExecution.executedPlan
      assert(plan.collect { case j: SortMergeJoinExec => j }.isEmpty,
        s"IVF-PQ candidate restriction must stay a broadcast join:\n$plan")
      assert(plan.flatMap(_.expressions.flatMap(
        _.collect { case e: CentroidArgmin => e })).nonEmpty,
        s"PQ code assignment lost the CentroidArgmin expression:\n$plan")
    }
  }

  test("scd2_build plans one exchange and one sort (both window passes share them)") {
    withoutAqe {
      val df = graft.operators.Scd.scd2Build(Tables.events(spark, sf))
      val plan = df.queryExecution.executedPlan
      val exchanges = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      val sorts = plan.collect { case s: org.apache.spark.sql.execution.SortExec => s }
      assert(exchanges.size == 1 && sorts.size == 1,
        s"change-detect lag and interval lead/version must reuse ONE hash(user_id) " +
          s"shuffle + ONE (ts, event_id) sort; got ${exchanges.size} exchanges, " +
          s"${sorts.size} sorts:\n$plan")
    }
  }

  test("dedup_*_fast audits: every nested-loop join has a one-row aggregate side") {
    // the audits cross-join three SCALAR aggregates (n_docs x n_true x
    // n_found) - the only place the library tolerates a nested-loop join.
    // This pin makes the tolerance structural: if a refactor ever routes a
    // corpus-sized frame (docs, truth pairs, candidate pairs) into a BNL -
    // the "safe only while tiny" failure mode - the plan breaks here, not
    // at 100 TB. An equi-key rewrite that removes the BNLs entirely also
    // passes (the assertion is per-BNL, vacuous at zero).
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.SparkPlan
    def scalarAgg(side: SparkPlan): Boolean = side.collectFirst {
      case a: BaseAggregateExec if a.groupingExpressions.isEmpty => a
    }.nonEmpty
    withoutAqe {
      val audits: Seq[(String, DataFrame)] = Seq(
        "dedup_minhash_lsh_fast" ->
          graft.operators.Dedup.dedupMinhashLshFastAudit(Tables.documents(spark, sf)),
        "dedup_simhash_fast" ->
          graft.operators.Dedup.dedupSimhashFastAudit(Tables.documents(spark, sf)),
        "dedup_paragraph_fast" ->
          graft.operators.Dedup.dedupParagraphFastAudit(Tables.documents(spark, sf)))
      audits.foreach { case (name, df) =>
        val plan = df.queryExecution.executedPlan
        val bnls = plan.collect { case j: BroadcastNestedLoopJoinExec => j }
        bnls.foreach { j =>
          assert(scalarAgg(j.left) || scalarAgg(j.right),
            s"$name plans a nested-loop join with NO scalar-aggregate side " +
              s"(corpus-sized BNL):\n$j")
        }
      }
    }
  }

  test("drift monitors read the documents corpus EXACTLY once per statistic") {
    // the grid's vals/srcs/total re-reduce the (source, v) aggregate rather
    // than re-aggregating the corpus: all four corpus-side exchanges
    // canonicalize onto one, ReuseExchange leaves ONE documents scan. The
    // r15 form planned FOUR scans — this pin is the one-corpus-pass claim
    // in Drift's scaladoc, made structural.
    import org.apache.spark.sql.execution.FileSourceScanExec
    withoutAqe {
      val targets: Seq[(String, DataFrame)] = Seq(
        "drift_ks" -> graft.operators.Drift.driftKs(Tables.documents(spark, sf)),
        "drift_chi2" -> graft.operators.Drift.driftChi2(Tables.documents(spark, sf)),
        "drift_tv" -> graft.operators.Drift.driftTv(Tables.documents(spark, sf)))
      targets.foreach { case (name, df) =>
        val scans = df.queryExecution.executedPlan.collect {
          case f: FileSourceScanExec => f
        }
        assert(scans.size == 1,
          s"$name reads the corpus ${scans.size} times (expected 1 — the " +
            s"other consumers must ReuseExchange the grid aggregate):\n" +
            df.queryExecution.executedPlan)
      }
    }
  }

  test("pruned-staging marts skip the battery-spread shuffle (one scan, minimal exchanges)") {
    // fdaRecallsFull/hnStoriesFull hash-repartition so their regex battery
    // parallelizes — but by_state / weekly / domain PRUNE the regex column,
    // and for them that repartition would be a full corpus shuffle in front
    // of an aggregate whose partial side reduces to a handful of rows. Pin
    // the pruned plans: one file scan, and no exchange beyond the
    // aggregation's own (by_state 1; domain 1; weekly 2 — the distinct-
    // author aggregate plans its extra exchange).
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.Exchange
    withoutAqe {
      for ((name, maxEx) <- Seq("fct_fda_recalls_by_state" -> 1,
          "fct_hn_domain_stats" -> 1, "fct_hn_weekly_stats" -> 2)) {
        val df = graft.SparkEntry.queries(name)(spark, sf)
        val plan = df.queryExecution.executedPlan
        val scans = plan.collect { case f: FileSourceScanExec => f }
        val exchanges = plan.collect { case e: Exchange => e }
        assert(scans.size == 1, s"$name expected 1 corpus scan, got ${scans.size}")
        assert(exchanges.size <= maxEx,
          s"$name expected <=$maxEx exchanges (battery-spread shuffle must be " +
            s"pruned away), got ${exchanges.size}:\n$plan")
      }
    }
  }

  test("union_all_rollup reads orders EXACTLY once (rollup rows re-reduce the base)") {
    // the r15 form scanned orders three times (per-priority, urgent slice,
    // all-row); the rollup legs now re-reduce the 5-row base aggregate and
    // the urgent slice is a conditional aggregate, not a pushable filter
    import org.apache.spark.sql.execution.FileSourceScanExec
    withoutAqe {
      val df = graft.operators.SetOps.unionAllRollup(Tables.orders(spark, sf))
      val scans = df.queryExecution.executedPlan.collect {
        case f: FileSourceScanExec => f
      }
      assert(scans.size == 1,
        s"union_all_rollup reads orders ${scans.size} times (expected 1):\n" +
          df.queryExecution.executedPlan)
    }
  }

  test("win_cusum_scalable registers exactly its 2 staged frames (within, scored)") {
    // the x1000 OOM regression class (SCALE.md): unstaged, the within-chunk
    // windows replay and the reassembly sort-merges two live window
    // pipelines. Pin BOTH directions: exactly 2 CacheScope registrations
    // (more would self-evict under keep=4 when composed), and the final
    // plan reads the `scored` stage via InMemoryTableScan twice (peaks +
    // final aggregate) instead of recomputing it.
    import graft.operators.CacheScope
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    // Fresh session: CacheScope registries are per-session, and re-invoking
    // an operator whose canonical plans are already registered is a
    // documented no-op — a sibling test registering the same frames first
    // would make `added` read 0 here (ADVICE r16's order-dependence).
    val sess = spark.newSession()
    sess.conf.set("spark.sql.adaptive.enabled", "false") // conf is per-session
    locally {
      val before = CacheScope.registeredKeys(sess).toSet
      val df = graft.operators.Windows.winCusumScalable(Tables.events(sess, sf))
      val added = CacheScope.registeredKeys(sess).toSet -- before
      assert(added.size == 2,
        s"winCusumScalable registered ${added.size} staged frames, expected 2")
      val scans = df.queryExecution.executedPlan.collect {
        case s: InMemoryTableScanExec => s
      }
      assert(scans.size == 2,
        s"expected the scored stage read twice via InMemoryTableScan, got " +
          s"${scans.size}:\n${df.queryExecution.executedPlan}")
    }
  }

  test("dedup_band_curve registers exactly its 2 shared stages (truth, signatures)") {
    // the 4.6x self-eviction incident (SCALE.md): the first cut registered
    // 5 frames against keep=4 and silently recomputed its own shingle
    // chain. Folded to truth + signatures; this pin fails if a refactor
    // grows registrations past the retention bound again.
    import graft.operators.CacheScope
    // fresh session for an order-independent registration count (see the
    // win_cusum_scalable pin above)
    val sess = spark.newSession()
    val before = CacheScope.registeredKeys(sess).toSet
    graft.operators.Dedup.dedupBandCurve(Tables.documents(sess, sf))
    val added = CacheScope.registeredKeys(sess).toSet -- before
    assert(added.size == 2,
      s"dedupBandCurve registered ${added.size} staged frames, expected 2 " +
        "(truth + signatures; >4 self-evicts under the default keep)")
  }

  test("dedup_embedding_lsh self-join legs canonicalize onto ONE banded exchange") {
    // regression pin for the round-13 staging lesson (SCALE.md): the wide
    // banded self-join's two legs are the same subplan and MUST plan as
    // one exchange + a ReusedExchange - when an input-staging refactor
    // broke canonical equality, the x1000 point silently shuffled the
    // banded corpus TWICE (3.48 GB vs 1.67, +55% cpu) with results
    // unchanged, the exact failure class only a plan pin can catch early.
    import org.apache.spark.sql.execution.exchange.{Exchange, ReusedExchangeExec}
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force the corpus-scale SMJ shape: at spec sf one side would broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try withoutAqe {
      for ((name, df) <- Seq(
          "dedup_embedding_lsh_auto" -> graft.operators.Dedup.dedupEmbeddingLshAuto(
            graft.operators.Dedup.plantNearDupes(Tables.embeddings(spark, sf))),
          "dedup_embedding_lsh_wide" -> graft.operators.Dedup.dedupEmbeddingLshWide(
            Tables.embeddings(spark, sf)))) {
        val plan = df.queryExecution.executedPlan
        val reused = plan.collect { case r: ReusedExchangeExec => r }
        assert(reused.nonEmpty,
          s"$name: the banded self-join legs no longer share one exchange " +
            s"(every banded byte will shuffle twice at corpus scale):\n$plan")
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
  }
}

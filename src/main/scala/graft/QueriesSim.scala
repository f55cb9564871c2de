package graft

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.DftAggregator
import graft.operators.Similarity

/** Similarity-search + spectral + sessionization queries with DuckDB
  * oracles. Cosine math runs in double on both engines and is rounded
  * before ranking so summation order can never flip a rank.
  */
object QueriesSim {

  private def tbl(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // SemDeDup-style semantic dedup: IVF-cell coarse clustering, exact
    // pairwise cosine only within a cell, pointer-jumped components,
    // keep the min id per component. The cell cap guards the adversarial
    // mass-duplicated-embedding case (one cell going quadratic); 4096 is
    // provably inert here — the embeddings table tops out at 2,000 rows
    // TOTAL at sf0.1 (max cell asserted < 4096 in OperatorSpec), so
    // results are bit-identical to the uncapped run.
    // refineTarget = None is the ORACLE-PINNED shape (raw lazy plan,
    // bit-reproducible in DuckDB); the operator DEFAULT is the measured
    // scale path (refineTarget = Some(4096)) — inert on this table's
    // ≤2,000 rows, pinned here so the oracle query's plan and cost
    // stay the audited r12 shape
    "q86_semantic_dedup" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s) // native graft_dot
      Similarity.semanticDedup(tbl(s, dir, "embeddings"), "vec_id", "embedding",
        nlist = 4, threshold = 0.4, maxCellSize = Some(4096),
        refineTarget = None)
        .select(col("id").as("vec_id"), col("cell"), col("canonical_id"),
          col("keep"))
        .orderBy(col("vec_id"))
    }),

    // IVF ANN with the nprobe recall knob: each query probes its 2
    // nearest cells (query side fans out ×2; corpus side keeps one cell
    // per vector inline on its scan), bounded top-k ranking
    "q104_ivf_nprobe" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s) // native graft_dot
      val emb = tbl(s, dir, "embeddings")
      Similarity.ivfTopKProbed(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, nlist = 4, nprobe = 2)
        .orderBy(col("qid"), col("rank"))
    }),

    // int8 scalar quantization: per-dim stats broadcast as literals,
    // map-side codes + reconstruction error; code sums are
    // integer-exact, error metrics rounded with both FP guards
    "q68_quantize_int8" -> ((s, dir) =>
      Similarity.scalarQuantizeInt8(tbl(s, dir, "embeddings"), "vec_id", "embedding")
        .select(col("id").as("vec_id"), col("q_sum"),
          (round(col("max_abs_err") + lit(1e-9), 4) + lit(0.0)).as("max_abs_err"),
          (round(col("mean_abs_err") + lit(1e-9), 4) + lit(0.0)).as("mean_abs_err"))
        .orderBy(col("vec_id"))),

    // PQ-style two-stage ANN: approximate top-20 on the int8
    // reconstruction, exact float rerank to top-5
    "q69_quantized_rerank" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s) // native graft_dot
      val emb = tbl(s, dir, "embeddings")
      Similarity.quantizedRerankTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, rerank = 20)
        .orderBy(col("qid"), col("rank"))
    }),

    // one Lloyd iteration: broadcast-literal centroids (first 8 by id),
    // map-side argmin assignment, one (cluster, dim) mean shuffle
    "q67_kmeans_step" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s) // native graft_dot
      Similarity.kmeansStep(tbl(s, dir, "embeddings"), "vec_id", "embedding", 8)
        .select(col("cluster"), col("dim").cast("long").as("dim"),
          col("n_members"),
          (round(col("mean") + lit(1e-9), 4) + lit(0.0)).as("mean"))
        .orderBy(col("cluster"), col("dim"))
    }),

    // brute-force cosine top-k (queries broadcast against corpus scan)
    // product-quantization ADC top-k: corpus scored through its m-byte
    // PQ codes against a per-query literal lookup table — the
    // memory-bandwidth half of large-scale ANN (pair with IVF cells for
    // candidate pruning). Deterministic seed codebooks (slices of the
    // first ksub vectors) so the oracle can rebuild the codebooks,
    // codes, LUT and ranking exactly; pqTrainBooks refinement is
    // spec-covered (error-decrease law), not oracled — trained books
    // are floating fixpoints, not engine-portable integers.
    "q80_pq_adc" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val emb = tbl(s, dir, "embeddings")
      Similarity.pqTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, m = 4, ksub = 8)
        .orderBy(col("qid"), col("rank"))
    }),

    // IVF+PQ: the q48 coarse cells prune candidates to the query's
    // cell, the q80 codes make each candidate a LUT fold — the
    // composed billion-scale ANN layout, both components' determinism
    // arguments unchanged
    "q81_ivfpq" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val emb = tbl(s, dir, "embeddings")
      Similarity.ivfPqTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, nlist = 4, m = 4, ksub = 8)
        .orderBy(col("qid"), col("rank"))
    }),

    "q35_cosine_topk" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s) // native graft_dot
      val emb = tbl(s, dir, "embeddings")
      Similarity.cosineTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5)
        .orderBy(col("qid"), col("rank"))
    }),

    // md5-seeded random-hyperplane LSH buckets (the ANN scale path)
    "q36_lsh_buckets" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      Similarity.hyperplaneBuckets(tbl(s, dir, "embeddings"),
        "vec_id", "embedding", planes = 6)
        .select(col("id").as("vec_id"), col("bucket"))
        .orderBy(col("vec_id"))
    }),

    // LSH-bucketed ANN top-k — the no-broadcast scale path under oracle
    "q49_ann_bucketed" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val emb = tbl(s, dir, "embeddings")
      Similarity.annTopKBucketed(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, planes = 4)
        .orderBy(col("qid"), col("rank"))
    }),

    // multi-table LSH ANN: 4 independent 4-plane tables, candidates =
    // bucket-mates in ANY table — the recall knob (measured on real
    // embeddings: 0.12 single-table → 0.66 at 8 tables, OperatorSpec)
    "q61_ann_multitable" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val emb = tbl(s, dir, "embeddings")
      Similarity.annTopKMultiTable(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, planes = 4, tables = 4)
        .orderBy(col("qid"), col("rank"))
    }),

    // IVF coarse cells: argmax projection onto md5-derived centroids
    "q48_ivf_cells" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      Similarity.ivfAssign(tbl(s, dir, "embeddings"), "vec_id", "embedding",
        nlist = 4)
        .select(col("id").as("vec_id"), col("cell"))
        .orderBy(col("vec_id"))
    }),

    // per-user DFT of the first-8 event series, via the typed Aggregator
    // (the reference's useDFT collector shape, collector.h:2744-2779).
    // "First 8 per user" comes from the bounded FirstKByOrder aggregate,
    // NOT Window.partitionBy(user_id) + row_number: a hot user (one bot
    // owning a big slice of events) would pin its entire history to one
    // window task just to keep 8 rows — the aggregate's map-side partials
    // carry ≤ 8 rows per (user × task) instead. size == 8 keeps exactly
    // the users with ≥ 8 events, matching the old count-filter.
    "q37_dft8" -> ((s, dir) => {
      val dftUdaf = udaf(new DftAggregator(),
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble))
      val firstK = udaf(new graft.functions.FirstKByOrder(8))
      val series = tbl(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(firstK(col("event_id").cast("long"), col("value")).as("fk"))
        .filter(size(col("fk.items")) === 8)
        .select(col("user_id"), posexplode(col("fk.items")).as(Seq("rn", "item")))
      val spec = series.groupBy(col("user_id"))
        .agg(dftUdaf(col("rn").cast("long"), col("item.payload")).as("bins"))
      spec.select(col("user_id"), posexplode(col("bins")).as(Seq("k", "bin")))
        .select(col("user_id"), col("k").cast("long").as("k"),
          // + 0.0 normalizes IEEE -0.0 (im-bins of real signals land on
          // exact ±0.0; the driver hash-compares, so the sign bit matters)
          (round(col("bin._1"), 4) + lit(0.0)).as("re"),
          (round(col("bin._2"), 4) + lit(0.0)).as("im"))
        .orderBy(col("user_id"), col("k"))
    }),

    // per-user FFT of the first-12 series: pad-to-16 → transform →
    // truncate-to-12, the reference's exact quirk (collector.h:2836-2876)
    "q42_fft12" -> ((s, dir) => {
      val fftUdaf = udaf(new DftAggregator(useFft = true),
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble))
      // same window-free first-k shape as q37 (see the note there)
      val firstK = udaf(new graft.functions.FirstKByOrder(12))
      val series = tbl(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(firstK(col("event_id").cast("long"), col("value")).as("fk"))
        .filter(size(col("fk.items")) === 12)
        .select(col("user_id"), posexplode(col("fk.items")).as(Seq("rn", "item")))
      val spec = series.groupBy(col("user_id"))
        .agg(fftUdaf(col("rn").cast("long"), col("item.payload")).as("bins"))
      spec.select(col("user_id"), posexplode(col("bins")).as(Seq("k", "bin")))
        .select(col("user_id"), col("k").cast("long").as("k"),
          (round(col("bin._1"), 4) + lit(0.0)).as("re"),
          (round(col("bin._2"), 4) + lit(0.0)).as("im"))
        .orderBy(col("user_id"), col("k"))
    }),

    // AS-OF join: latest order at or before each event's timestamp for the
    // event's implied customer — union + running-last, one shuffle
    "q43_asof_join" -> ((s, dir) => {
      val ev = Queries.eventsTsNanos(s, dir)
        .select(col("event_id"), col("user_id"), col("ts"))
      val ord = tbl(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"), col("o_totalprice"))
      graft.operators.Joins.asof(
        left = ev, right = ord,
        leftKey = col("user_id") + 1, rightKey = col("o_custkey"),
        leftTime = col("ts"), // long nanos (eventsTsNanos)
        rightTime = unix_micros(col("o_orderdate").cast("timestamp")) * 1000L,
        rightPayload = Seq("o_orderkey", "o_totalprice"),
        rightTieBreak = col("o_orderkey"))
        .select(col("event_id"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("last_price"))
        .orderBy(col("event_id"))
    }),

    // RANGE join: same-user event pairs within 10 minutes AFTER each
    // trigger event — binned interval join (equi-join on (key, bin) +
    // residual filter), never a theta join
    "q51_range_join" -> ((s, dir) => {
      // MICRO granularity on both engines: ts is long nanos here, and
      // DuckDB's epoch_us() is micro precision — truncate to micros
      // (integer div, exact) so window membership and gaps agree
      val ev = Queries.eventsTsNanos(s, dir)
        .select(col("event_id"), col("user_id"),
          expr("ts div 1000L").as("ts_us"))
      val win = 600L * 1000000L // 10 min in micros
      val triggers = ev.select(col("event_id").as("t_event"),
        col("user_id").as("t_user"), col("ts_us").as("lo"),
        (col("ts_us") + win).as("hi"))
      graft.operators.Joins.rangeJoin(ev, triggers,
        leftKeyCol = "user_id", rightKeyCol = "t_user",
        leftTimeCol = "ts_us", rightLoCol = "lo", rightHiCol = "hi",
        binWidth = win)
        .filter(col("l.event_id") =!= col("r.t_event"))
        .select(col("r.t_event").as("a"), col("l.event_id").as("b"),
          floor((col("l.ts_us") - col("r.lo")).cast("double") / 1e3).cast("long")
            .as("gap_ms"))
        .orderBy(col("a"), col("b"))
    }),

    // gap-based sessionization (30-min inactivity) — batch shape of the
    // streaming session_window. The per-user lag runs through the
    // exclusive-prefix groupedRunningLag, NOT Window.partitionBy(user_id):
    // a hot user (one bot owning half the events) would pin its entire
    // history to one window task; the bucketed lag splits each user's
    // rows across sub-buckets with a per-bucket carry instead
    "q38_sessions" -> ((s, dir) => {
      // ts arrives as long nanos (eventsTsNanos); the 30-min gap test is an
      // exact integer compare — no FP, so it can never disagree with the
      // oracle's epoch_ns() arithmetic. (ts, event_id) is strictly total
      // per user (event_id is the PK), as groupedRunningLag requires.
      graft.operators.Windows.groupedRunningLag(
        Queries.eventsTsNanos(s, dir), col("user_id"), col("ts"),
        Seq(col("ts"), col("event_id")), Seq(("ts", "__prev_ts")))
        .withColumn("gap", col("ts") - col("__prev_ts"))
        .withColumn("new_session",
          when(col("gap").isNull || col("gap") > 1800L * 1000000000L, 1L).otherwise(0L))
        .groupBy(col("user_id"))
        .agg(sum(col("new_session")).as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy(col("user_id"))
    })
  )

  /** q68's int8 quantization as a CTE chain ending in `recon`
    * (vec_id, codes, e, mns, mxs, r) — shared by q68 (reconstruction
    * error) and q69 (quantized search + exact rerank). */
  private val quantCtes =
    """v AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      |  FROM embeddings),
      |comps AS (
      |  SELECT generate_subscripts(e, 1) AS dim, unnest(e) AS val FROM v),
      |stats AS (
      |  SELECT list(mn ORDER BY dim) AS mns, list(mx ORDER BY dim) AS mxs
      |  FROM (SELECT dim, min(val) AS mn, max(val) AS mx
      |        FROM comps GROUP BY dim)),
      |coded AS (
      |  SELECT v.vec_id,
      |    list_apply(range(1, len(v.e) + 1), i ->
      |      CASE WHEN s.mxs[i] = s.mns[i] THEN 0.0
      |        ELSE floor((v.e[i] - s.mns[i]) / (s.mxs[i] - s.mns[i])
      |          * 255.0 + 0.5) END) AS codes,
      |    v.e AS e, s.mns AS mns, s.mxs AS mxs
      |  FROM v CROSS JOIN stats s),
      |recon AS (
      |  SELECT vec_id, codes, e, mns, mxs,
      |    list_apply(range(1, len(e) + 1), i ->
      |      mns[i] + codes[i] * (mxs[i] - mns[i]) / 255.0) AS r
      |  FROM coded)""".stripMargin

  val oracles: Map[String, String] = Map(
    // replays semanticDedup: q48's cell assignment, within-cell raw
    // cosine threshold (same sequential double sums both engines — the
    // q40 precedent), transitive closure (q65's pattern), min-id labels
    "q86_semantic_dedup" ->
      """WITH RECURSIVE comps AS (
        |  SELECT vec_id, unnest(embedding) AS comp,
        |    generate_subscripts(embedding, 1) - 1 AS dim
        |  FROM embeddings),
        |projs AS (
        |  SELECT vec_id, c.c AS cell,
        |    sum(CAST(comp AS DOUBLE) *
        |      (CASE WHEN substr(md5((c.c + 7919)::VARCHAR || '-' || dim::VARCHAR), 1, 1)
        |        BETWEEN '8' AND 'f' THEN 1.0 ELSE -1.0 END)) AS proj
        |  FROM comps, generate_series(0, 3) AS c(c)
        |  GROUP BY vec_id, c.c),
        |ranked AS (
        |  SELECT vec_id, cell, row_number() OVER (
        |    PARTITION BY vec_id ORDER BY proj DESC, cell ASC) AS rn
        |  FROM projs),
        |cells AS (SELECT vec_id, cell FROM ranked WHERE rn = 1),
        |v AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings),
        |pairs AS (
        |  SELECT a.vec_id AS a, b.vec_id AS b
        |  FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id
        |  JOIN v va ON va.vec_id = a.vec_id
        |  JOIN v vb ON vb.vec_id = b.vec_id
        |  WHERE list_sum(list_apply(range(1, len(va.e) + 1), i -> va.e[i] * vb.e[i]))
        |      / (sqrt(list_sum(list_apply(va.e, x -> x * x)))
        |         * sqrt(list_sum(list_apply(vb.e, x -> x * x)))) >= 0.4),
        |edges AS (
        |  SELECT a AS src, b AS dst FROM pairs
        |  UNION SELECT b, a FROM pairs),
        |reach(id, r) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e.src, rr.r FROM edges e JOIN reach rr ON rr.id = e.dst),
        |lab AS (SELECT id, min(r) AS label FROM reach GROUP BY id)
        |SELECT c.vec_id, CAST(c.cell AS BIGINT) AS cell,
        |  CAST(coalesce(l.label, c.vec_id) AS BIGINT) AS canonical_id,
        |  coalesce(l.label, c.vec_id) = c.vec_id AS keep
        |FROM cells c LEFT JOIN lab l ON l.id = c.vec_id
        |ORDER BY c.vec_id""".stripMargin,
    // floor-based code assignment (identical doubles floor identically;
    // round-half algorithms differ between engines), ordered list folds
    "q68_quantize_int8" ->
      s"""WITH $quantCtes,
         |errs AS (
         |  SELECT vec_id,
         |    CAST(list_sum(codes) AS BIGINT) AS q_sum,
         |    list_apply(range(1, len(e) + 1), i -> abs(r[i] - e[i])) AS err
         |  FROM recon)
         |SELECT vec_id, q_sum,
         |  round(list_max(err) + 1e-9, 4) + 0.0 AS max_abs_err,
         |  round(list_sum(err) / len(err) + 1e-9, 4) + 0.0 AS mean_abs_err
         |FROM errs ORDER BY vec_id""".stripMargin,

    // approximate scores on the reconstruction (rounded, id tiebreak),
    // exact q35-style cosine on the 20 survivors
    "q69_quantized_rerank" ->
      s"""WITH $quantCtes,
         |qv AS (SELECT vec_id AS qid, e AS qe, r AS qr FROM recon
         |       WHERE vec_id < 10),
         |approx AS (
         |  SELECT q.qid, c.vec_id AS nid, c.e AS ne, q.qe AS qe,
         |    round(list_sum(list_apply(range(1, len(c.r) + 1),
         |        i -> q.qr[i] * c.r[i]))
         |      / (sqrt(list_sum(list_apply(q.qr, x -> x * x)))
         |         * sqrt(list_sum(list_apply(c.r, x -> x * x)))) + 1e-9, 4)
         |      AS approx
         |  FROM recon c CROSS JOIN qv q WHERE c.vec_id <> q.qid),
         |cut AS (
         |  SELECT * FROM approx
         |  QUALIFY row_number() OVER (PARTITION BY qid
         |    ORDER BY approx DESC, nid ASC) <= 20),
         |exact AS (
         |  SELECT qid, nid,
         |    round(list_sum(list_apply(range(1, len(qe) + 1),
         |        i -> qe[i] * ne[i]))
         |      / (sqrt(list_sum(list_apply(qe, x -> x * x)))
         |         * sqrt(list_sum(list_apply(ne, x -> x * x)))), 4) AS cosine
         |  FROM cut)
         |SELECT qid, CAST(row_number() OVER (PARTITION BY qid
         |    ORDER BY cosine DESC, nid ASC) AS BIGINT) AS rank,
         |  nid, cosine
         |FROM exact
         |QUALIFY rank <= 5
         |ORDER BY qid, rank""".stripMargin,

    // same reduced-form distance (−2·x·c + c·c) and the established
    // ordered list-dot, so the argmin ranks identically; means rounded
    // with the tie and signed-zero guards on both sides
    "q67_kmeans_step" ->
      """WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings),
        |cent AS (
        |  SELECT vec_id AS cid, e AS ce FROM v ORDER BY vec_id LIMIT 8),
        |assigned AS (
        |  SELECT v.vec_id, c.cid,
        |    -2.0 * list_sum(list_apply(range(1, len(c.ce) + 1),
        |        i -> v.e[i] * c.ce[i]))
        |      + list_sum(list_apply(c.ce, x -> x * x)) AS d
        |  FROM v CROSS JOIN cent c),
        |best AS (
        |  SELECT vec_id, cid FROM assigned
        |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) = 1),
        |comps AS (
        |  SELECT b.cid AS cluster, generate_subscripts(v.e, 1) - 1 AS dim,
        |    unnest(v.e) AS val
        |  FROM best b JOIN v ON v.vec_id = b.vec_id)
        |SELECT cluster, CAST(dim AS BIGINT) AS dim, count(*) AS n_members,
        |  round(avg(val) + 1e-9, 4) + 0.0 AS mean
        |FROM comps GROUP BY cluster, dim
        |ORDER BY cluster, dim""".stripMargin,

    // q80's PQ chain with q48's cell computation spliced in: candidates
    // must share the query's argmax pseudo-centroid cell
    "q81_ivfpq" ->
      """WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings),
        |comps AS (
        |  SELECT vec_id, unnest(embedding) AS comp,
        |    generate_subscripts(embedding, 1) - 1 AS dim
        |  FROM embeddings),
        |projs AS (
        |  SELECT vec_id, c.c AS cell,
        |    sum(CAST(comp AS DOUBLE) *
        |      (CASE WHEN substr(md5((c.c + 7919)::VARCHAR || '-' || dim::VARCHAR), 1, 1)
        |        BETWEEN '8' AND 'f' THEN 1.0 ELSE -1.0 END)) AS proj
        |  FROM comps, generate_series(0, 3) AS c(c)
        |  GROUP BY vec_id, c.c),
        |cells AS (
        |  SELECT vec_id, cell FROM projs
        |  QUALIFY row_number() OVER (PARTITION BY vec_id
        |    ORDER BY proj DESC, cell ASC) = 1),
        |seeds0 AS (SELECT vec_id, e FROM v ORDER BY vec_id LIMIT 8),
        |seeds AS (
        |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, e
        |  FROM seeds0),
        |books AS (
        |  SELECT t.j AS sub, s.cid,
        |    list_slice(s.e, t.j * 16 + 1, t.j * 16 + 16) AS ce
        |  FROM seeds s CROSS JOIN range(4) t(j)),
        |dists AS (
        |  SELECT v.vec_id, b.sub, b.cid,
        |    -2.0 * list_sum(list_apply(range(1, 17),
        |        i -> v.e[b.sub * 16 + i] * b.ce[i]))
        |      + list_sum(list_apply(b.ce, x -> x * x)) AS d
        |  FROM v CROSS JOIN books b),
        |codes AS (
        |  SELECT vec_id, sub, cid AS code FROM dists
        |  QUALIFY row_number() OVER (PARTITION BY vec_id, sub
        |    ORDER BY d, cid) = 1),
        |q AS (SELECT vec_id AS qid, e AS qe FROM v WHERE vec_id < 10),
        |lut AS (
        |  SELECT q.qid, b.sub, b.cid,
        |    -2.0 * list_sum(list_apply(range(1, 17),
        |        i -> q.qe[b.sub * 16 + i] * b.ce[i]))
        |      + list_sum(list_apply(b.ce, x -> x * x)) AS d
        |  FROM q CROSS JOIN books b),
        |grp AS (
        |  SELECT l.qid, c.vec_id AS nid,
        |    sum(CASE WHEN c.sub = 0 THEN l.d END) AS d0,
        |    sum(CASE WHEN c.sub = 1 THEN l.d END) AS d1,
        |    sum(CASE WHEN c.sub = 2 THEN l.d END) AS d2,
        |    sum(CASE WHEN c.sub = 3 THEN l.d END) AS d3
        |  FROM codes c
        |  JOIN lut l ON l.sub = c.sub AND l.cid = c.code
        |  JOIN cells cv ON cv.vec_id = c.vec_id
        |  JOIN cells cq ON cq.vec_id = l.qid AND cq.cell = cv.cell
        |  WHERE c.vec_id <> l.qid
        |  GROUP BY l.qid, c.vec_id),
        |scored AS (
        |  SELECT qid, nid,
        |    round((((0.0 + d0) + d1) + d2) + d3, 4) + 0.0 AS adc
        |  FROM grp),
        |ranked AS (
        |  SELECT qid, nid, adc, CAST(row_number() OVER (
        |    PARTITION BY qid ORDER BY adc ASC, nid ASC) AS BIGINT) AS rank
        |  FROM scored)
        |SELECT qid, rank, nid, adc FROM ranked WHERE rank <= 5
        |ORDER BY qid, rank""".stripMargin,

    // replays seed codebooks → per-(vector, subspace) argmin codes →
    // per-query LUT → ADC sum in the SAME left-to-right order as the
    // Spark fold (((0+d0)+d1)+d2)+d3 via conditional aggregation
    "q80_pq_adc" ->
      """WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings),
        |seeds0 AS (SELECT vec_id, e FROM v ORDER BY vec_id LIMIT 8),
        |seeds AS (
        |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, e
        |  FROM seeds0),
        |books AS (
        |  SELECT t.j AS sub, s.cid,
        |    list_slice(s.e, t.j * 16 + 1, t.j * 16 + 16) AS ce
        |  FROM seeds s CROSS JOIN range(4) t(j)),
        |dists AS (
        |  SELECT v.vec_id, b.sub, b.cid,
        |    -2.0 * list_sum(list_apply(range(1, 17),
        |        i -> v.e[b.sub * 16 + i] * b.ce[i]))
        |      + list_sum(list_apply(b.ce, x -> x * x)) AS d
        |  FROM v CROSS JOIN books b),
        |codes AS (
        |  SELECT vec_id, sub, cid AS code FROM dists
        |  QUALIFY row_number() OVER (PARTITION BY vec_id, sub
        |    ORDER BY d, cid) = 1),
        |q AS (SELECT vec_id AS qid, e AS qe FROM v WHERE vec_id < 10),
        |lut AS (
        |  SELECT q.qid, b.sub, b.cid,
        |    -2.0 * list_sum(list_apply(range(1, 17),
        |        i -> q.qe[b.sub * 16 + i] * b.ce[i]))
        |      + list_sum(list_apply(b.ce, x -> x * x)) AS d
        |  FROM q CROSS JOIN books b),
        |grp AS (
        |  SELECT l.qid, c.vec_id AS nid,
        |    sum(CASE WHEN c.sub = 0 THEN l.d END) AS d0,
        |    sum(CASE WHEN c.sub = 1 THEN l.d END) AS d1,
        |    sum(CASE WHEN c.sub = 2 THEN l.d END) AS d2,
        |    sum(CASE WHEN c.sub = 3 THEN l.d END) AS d3
        |  FROM codes c JOIN lut l ON l.sub = c.sub AND l.cid = c.code
        |  WHERE c.vec_id <> l.qid
        |  GROUP BY l.qid, c.vec_id),
        |scored AS (
        |  SELECT qid, nid,
        |    round((((0.0 + d0) + d1) + d2) + d3, 4) + 0.0 AS adc
        |  FROM grp),
        |ranked AS (
        |  SELECT qid, nid, adc, CAST(row_number() OVER (
        |    PARTITION BY qid ORDER BY adc ASC, nid ASC) AS BIGINT) AS rank
        |  FROM scored)
        |SELECT qid, rank, nid, adc FROM ranked WHERE rank <= 5
        |ORDER BY qid, rank""".stripMargin,

    "q35_cosine_topk" ->
      """WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings),
        |q AS (SELECT vec_id AS qid, e AS qe FROM v WHERE vec_id < 10),
        |scored AS (
        |  SELECT q.qid, v.vec_id AS nid,
        |    round(list_sum(list_apply(range(1, len(q.qe) + 1),
        |            i -> q.qe[i] * v.e[i]))
        |      / (sqrt(list_sum(list_apply(q.qe, x -> x * x)))
        |         * sqrt(list_sum(list_apply(v.e, x -> x * x)))), 4) AS cosine
        |  FROM v CROSS JOIN q WHERE v.vec_id <> q.qid),
        |ranked AS (
        |  SELECT qid, nid, cosine, CAST(row_number() OVER (
        |    PARTITION BY qid ORDER BY cosine DESC, nid ASC) AS BIGINT) AS rank
        |  FROM scored)
        |SELECT qid, rank, nid, cosine FROM ranked WHERE rank <= 5
        |ORDER BY qid, rank""".stripMargin,

    "q36_lsh_buckets" ->
      """WITH comps AS (
        |  SELECT vec_id, unnest(embedding) AS comp,
        |    generate_subscripts(embedding, 1) - 1 AS dim
        |  FROM embeddings),
        |projs AS (
        |  SELECT vec_id, p.p AS plane,
        |    sum(CAST(comp AS DOUBLE) *
        |      (CASE WHEN substr(md5(p.p::VARCHAR || '-' || dim::VARCHAR), 1, 1)
        |        BETWEEN '8' AND 'f' THEN 1.0 ELSE -1.0 END)) AS proj
        |  FROM comps, generate_series(0, 5) AS p(p)
        |  GROUP BY vec_id, p.p)
        |SELECT vec_id,
        |  CAST(sum(CASE WHEN proj > 0 THEN CAST(pow(2, plane) AS BIGINT)
        |    ELSE 0 END) AS BIGINT) AS bucket
        |FROM projs GROUP BY vec_id ORDER BY vec_id""".stripMargin,

    "q49_ann_bucketed" ->
      """WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings),
        |comps AS (
        |  SELECT vec_id, unnest(embedding) AS comp,
        |    generate_subscripts(embedding, 1) - 1 AS dim
        |  FROM embeddings),
        |projs AS (
        |  SELECT vec_id, p.p AS plane,
        |    sum(CAST(comp AS DOUBLE) *
        |      (CASE WHEN substr(md5(p.p::VARCHAR || '-' || dim::VARCHAR), 1, 1)
        |        BETWEEN '8' AND 'f' THEN 1.0 ELSE -1.0 END)) AS proj
        |  FROM comps, generate_series(0, 3) AS p(p)
        |  GROUP BY vec_id, p.p),
        |buckets AS (
        |  SELECT vec_id,
        |    sum(CASE WHEN proj > 0 THEN CAST(pow(2, plane) AS BIGINT)
        |      ELSE 0 END) AS bucket
        |  FROM projs GROUP BY vec_id),
        |q AS (
        |  SELECT v.vec_id AS qid, v.e AS qe, b.bucket
        |  FROM v JOIN buckets b ON v.vec_id = b.vec_id WHERE v.vec_id < 10),
        |scored AS (
        |  SELECT q.qid, v.vec_id AS nid,
        |    round(list_sum(list_apply(range(1, len(q.qe) + 1),
        |            i -> q.qe[i] * v.e[i]))
        |      / (sqrt(list_sum(list_apply(q.qe, x -> x * x)))
        |         * sqrt(list_sum(list_apply(v.e, x -> x * x)))), 4) AS cosine
        |  FROM v JOIN buckets b ON v.vec_id = b.vec_id
        |  JOIN q ON b.bucket = q.bucket AND v.vec_id <> q.qid),
        |ranked AS (
        |  SELECT qid, nid, cosine, CAST(row_number() OVER (
        |    PARTITION BY qid ORDER BY cosine DESC, nid ASC) AS BIGINT) AS rank
        |  FROM scored)
        |SELECT qid, rank, nid, cosine FROM ranked WHERE rank <= 5
        |ORDER BY qid, rank""".stripMargin,

    // plane family for table t is planeSign(t*4 + p, ·) — the Spark
    // side's planeOffset construction, mirrored
    "q61_ann_multitable" ->
      """WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings),
        |comps AS (
        |  SELECT vec_id, unnest(embedding) AS comp,
        |    generate_subscripts(embedding, 1) - 1 AS dim
        |  FROM embeddings),
        |projs AS (
        |  SELECT vec_id, t.t AS tbl, p.p AS plane,
        |    sum(CAST(comp AS DOUBLE) *
        |      (CASE WHEN substr(md5((t.t * 4 + p.p)::VARCHAR || '-' || dim::VARCHAR), 1, 1)
        |        BETWEEN '8' AND 'f' THEN 1.0 ELSE -1.0 END)) AS proj
        |  FROM comps, generate_series(0, 3) AS t(t), generate_series(0, 3) AS p(p)
        |  GROUP BY vec_id, t.t, p.p),
        |buckets AS (
        |  SELECT vec_id, tbl,
        |    sum(CASE WHEN proj > 0 THEN CAST(pow(2, plane) AS BIGINT)
        |      ELSE 0 END) AS bucket
        |  FROM projs GROUP BY vec_id, tbl),
        |qb AS (SELECT vec_id AS qid, tbl, bucket FROM buckets WHERE vec_id < 10),
        |cand AS (
        |  SELECT DISTINCT qb.qid, b.vec_id AS nid
        |  FROM buckets b
        |  JOIN qb ON b.tbl = qb.tbl AND b.bucket = qb.bucket AND b.vec_id <> qb.qid),
        |scored AS (
        |  SELECT c.qid, c.nid,
        |    round(list_sum(list_apply(range(1, len(vq.e) + 1),
        |            i -> vq.e[i] * vn.e[i]))
        |      / (sqrt(list_sum(list_apply(vq.e, x -> x * x)))
        |         * sqrt(list_sum(list_apply(vn.e, x -> x * x)))), 4) AS cosine
        |  FROM cand c
        |  JOIN v vq ON vq.vec_id = c.qid
        |  JOIN v vn ON vn.vec_id = c.nid),
        |ranked AS (
        |  SELECT qid, nid, cosine, CAST(row_number() OVER (
        |    PARTITION BY qid ORDER BY cosine DESC, nid ASC) AS BIGINT) AS rank
        |  FROM scored)
        |SELECT qid, rank, nid, cosine FROM ranked WHERE rank <= 5
        |ORDER BY qid, rank""".stripMargin,

    // same cell projections as q48; queries take rn <= 2 (nprobe = 2),
    // corpus keeps rn = 1 — the operator's exact probe semantics
    "q104_ivf_nprobe" ->
      """WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings),
        |comps AS (
        |  SELECT vec_id, unnest(embedding) AS comp,
        |    generate_subscripts(embedding, 1) - 1 AS dim
        |  FROM embeddings),
        |projs AS (
        |  SELECT vec_id, c.c AS cell,
        |    sum(CAST(comp AS DOUBLE) *
        |      (CASE WHEN substr(md5((c.c + 7919)::VARCHAR || '-' || dim::VARCHAR), 1, 1)
        |        BETWEEN '8' AND 'f' THEN 1.0 ELSE -1.0 END)) AS proj
        |  FROM comps, generate_series(0, 3) AS c(c)
        |  GROUP BY vec_id, c.c),
        |pranked AS (
        |  SELECT vec_id, cell, row_number() OVER (
        |    PARTITION BY vec_id ORDER BY proj DESC, cell ASC) AS rn
        |  FROM projs),
        |cells AS (SELECT vec_id, cell FROM pranked WHERE rn = 1),
        |qcells AS (
        |  SELECT vec_id AS qid, cell FROM pranked
        |  WHERE rn <= 2 AND vec_id < 10),
        |scored AS (
        |  SELECT qc.qid, ce.vec_id AS nid,
        |    round(list_sum(list_apply(range(1, len(vq.e) + 1),
        |            i -> vq.e[i] * vn.e[i]))
        |      / (sqrt(list_sum(list_apply(vq.e, x -> x * x)))
        |         * sqrt(list_sum(list_apply(vn.e, x -> x * x)))), 4) AS cosine
        |  FROM cells ce
        |  JOIN qcells qc ON ce.cell = qc.cell AND ce.vec_id <> qc.qid
        |  JOIN v vq ON vq.vec_id = qc.qid
        |  JOIN v vn ON vn.vec_id = ce.vec_id),
        |ranked AS (
        |  SELECT qid, nid, cosine, CAST(row_number() OVER (
        |    PARTITION BY qid ORDER BY cosine DESC, nid ASC) AS BIGINT) AS rank
        |  FROM scored)
        |SELECT qid, rank, nid, cosine FROM ranked WHERE rank <= 5
        |ORDER BY qid, rank""".stripMargin,

    "q48_ivf_cells" ->
      """WITH comps AS (
        |  SELECT vec_id, unnest(embedding) AS comp,
        |    generate_subscripts(embedding, 1) - 1 AS dim
        |  FROM embeddings),
        |projs AS (
        |  SELECT vec_id, c.c AS cell,
        |    sum(CAST(comp AS DOUBLE) *
        |      (CASE WHEN substr(md5((c.c + 7919)::VARCHAR || '-' || dim::VARCHAR), 1, 1)
        |        BETWEEN '8' AND 'f' THEN 1.0 ELSE -1.0 END)) AS proj
        |  FROM comps, generate_series(0, 3) AS c(c)
        |  GROUP BY vec_id, c.c),
        |ranked AS (
        |  SELECT vec_id, cell, row_number() OVER (
        |    PARTITION BY vec_id ORDER BY proj DESC, cell ASC) AS rn
        |  FROM projs)
        |SELECT vec_id, CAST(cell AS BIGINT) AS cell
        |FROM ranked WHERE rn = 1 ORDER BY vec_id""".stripMargin,

    "q37_dft8" ->
      """WITH numbered AS (
        |  SELECT user_id, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY event_id) - 1 AS n
        |  FROM events),
        |series AS (SELECT * FROM numbered WHERE n < 8),
        |full8 AS (
        |  SELECT user_id FROM series GROUP BY user_id HAVING count(*) = 8)
        |SELECT s.user_id, CAST(k.k AS BIGINT) AS k,
        |  round(sum(s.value * cos(-2 * pi() * k.k * s.n / 8)), 4) + 0.0 AS re,
        |  round(sum(s.value * sin(-2 * pi() * k.k * s.n / 8)), 4) + 0.0 AS im
        |FROM series s JOIN full8 f ON s.user_id = f.user_id,
        |  generate_series(0, 7) AS k(k)
        |GROUP BY s.user_id, k.k ORDER BY s.user_id, k""".stripMargin,

    "q42_fft12" ->
      """WITH numbered AS (
        |  SELECT user_id, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY event_id) - 1 AS n
        |  FROM events),
        |series AS (SELECT * FROM numbered WHERE n < 12),
        |full12 AS (
        |  SELECT user_id FROM series GROUP BY user_id HAVING count(*) = 12)
        |SELECT s.user_id, CAST(k.k AS BIGINT) AS k,
        |  round(sum(s.value * cos(-2 * pi() * k.k * s.n / 16)), 4) + 0.0 AS re,
        |  round(sum(s.value * sin(-2 * pi() * k.k * s.n / 16)), 4) + 0.0 AS im
        |FROM series s JOIN full12 f ON s.user_id = f.user_id,
        |  generate_series(0, 11) AS k(k)
        |GROUP BY s.user_id, k.k ORDER BY s.user_id, k""".stripMargin,

    "q43_asof_join" ->
      """WITH l AS (
        |  SELECT user_id + 1 AS k, epoch_ns(ts) AS t, 1 AS tag,
        |    CAST(NULL AS BIGINT) AS tie, event_id,
        |    CAST(NULL AS BIGINT) AS o_orderkey,
        |    CAST(NULL AS DOUBLE) AS o_totalprice
        |  FROM events),
        |r AS (
        |  SELECT o_custkey AS k, epoch_ns(o_orderdate) AS t, 0 AS tag,
        |    o_orderkey AS tie, CAST(NULL AS BIGINT) AS event_id,
        |    o_orderkey, o_totalprice
        |  FROM orders),
        |u AS (SELECT * FROM l UNION ALL SELECT * FROM r),
        |c AS (
        |  SELECT event_id, tag,
        |    last_value(o_orderkey IGNORE NULLS) OVER (
        |      PARTITION BY k ORDER BY t, tag, tie NULLS FIRST
        |      ROWS UNBOUNDED PRECEDING) AS ok,
        |    last_value(o_totalprice IGNORE NULLS) OVER (
        |      PARTITION BY k ORDER BY t, tag, tie NULLS FIRST
        |      ROWS UNBOUNDED PRECEDING) AS tp
        |  FROM u)
        |SELECT event_id, ok AS o_orderkey, round(tp, 2) AS last_price
        |FROM c WHERE tag = 1 ORDER BY event_id""".stripMargin,

    "q51_range_join" ->
      """SELECT r0.event_id AS a, l0.event_id AS b,
        |  CAST(floor((epoch_us(l0.ts) - epoch_us(r0.ts)) / 1000.0) AS BIGINT)
        |    AS gap_ms
        |FROM events l0 JOIN events r0 ON l0.user_id = r0.user_id
        |  AND epoch_us(l0.ts) >= epoch_us(r0.ts)
        |  AND epoch_us(l0.ts) < epoch_us(r0.ts) + 600000000
        |  AND l0.event_id <> r0.event_id
        |ORDER BY a, b""".stripMargin,

    "q38_sessions" ->
      """WITH g AS (
        |  SELECT user_id, ts,
        |    epoch_ns(ts) - epoch_ns(lag(ts) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id)) AS gap
        |  FROM events)
        |SELECT user_id,
        |  CAST(sum(CASE WHEN gap IS NULL OR gap > 1800000000000 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_sessions,
        |  count(*) AS n_events
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin
  )
}

package graft.queries

import graft.Q
import graft.core.Graft.table
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents` (SURVEY extension §7.1-11 /
  * builder brief): exact hash dedup, MinHash + banded LSH candidate
  * generation, SimHash signatures, and Jaccard verification — each
  * oracle-checked against DuckDB running the identical pipeline.
  */
object DedupQueries {

  // Geometry is DERIVED, never hand-tuned: Dedup.lshGeometry maps a
  // corpus-count estimate to (bands, rowsPerBand) by the log₂ growth law.
  // The oracle SQL below is a static string, so it is generated for the
  // verify corpus (500 documents at sf0.01); the Spark bodies derive the
  // SAME geometry from the runtime corpus count via [[autoBands]] —
  // identical at verify scale by construction (stable across 500–5000
  // docs: 8 bands × 2 rows = 16 seeds), production-sized at real scale
  // where no oracle runs.
  private val VerifyCorpus = 500L
  private val Geom = Dedup.lshGeometry(VerifyCorpus)
  private val Bands = Geom._1
  private val RowsPerBand = Geom._2
  private val Seeds = Bands * RowsPerBand

  /** MinHash signature → banded LSH with corpus-adaptive geometry — the
    * shared front half of every near-dup query body. One count() job
    * (parquet metadata) prices the geometry.
    */
  private def autoBands(docs: org.apache.spark.sql.DataFrame) = {
    val (b, r) = Dedup.lshGeometry(docs.count())
    Dedup.lshBands(
      Dedup.minhash(docs, col("doc_id"), Dedup.bigrams(col("text")), b * r),
      b, r)
  }

  /** The simulated re-crawl — ONE definition of the doubled corpus (and
    * its +1e6 id offset) shared by the group step (q50) and the apply
    * step (q59), in both the Spark and the oracle form.
    */
  private def crawl(docs: org.apache.spark.sql.DataFrame) = {
    val d = docs.select(col("doc_id"), col("text"), col("lang"), col("n_chars"))
    d.unionByName(d.select((col("doc_id") + 1000000L).as("doc_id"),
      col("text"), col("lang"), col("n_chars")))
  }

  private val duckCrawlCte =
    """crawl AS (
      |  SELECT doc_id, text, lang, n_chars FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id, text, lang, n_chars FROM documents
      |)""".stripMargin

  /** Exact dedup over a simulated re-crawl (documents ∪ documents): group
    * by md5(text), keep the min doc_id, count members. The groupBy is the
    * whole operator — hash-partitioned, combiner on, no all-pairs.
    */
  val q50DedupExact = Q.checked(
    "q50_dedup_exact",
    s"""WITH $duckCrawlCte
      |SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS n
      |FROM crawl GROUP BY md5(text)""") { (s, dir) =>
    crawl(table(s, dir, "documents"))
      .groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n"))
  }

  /** [[duckSig]] at an explicit seed count — the oracle rendering of
    * [[Dedup.minhash]]'s md5 hash family (4 32-bit members per digest,
    * group 0 unprefixed — the [[graft.functions.Hashing
    * .hash32FamilyGroup]] convention).
    */
  private def duckSigOf(seeds: Int): String =
    (0 until seeds).map { i =>
      val g = i / 4
      val digest = if (g == 0) "md5(sh)" else s"md5('$g:'||sh)"
      s"min(('0x'||substring($digest,${1 + 8 * (i % 4)},8))::BIGINT) AS mh$i"
    }.mkString(",\n    ")

  private def duckSig: String = duckSigOf(Seeds)

  /** [[duckBands]] at an explicit geometry over an explicit signature
    * CTE — the oracle rendering of [[Dedup.lshBands]].
    */
  private def duckBandsOf(bands: Int, rows: Int, sigCte: String): String =
    (0 until bands).map { b =>
      val key = (0 until rows)
        .map(r => s"CAST(mh${b * rows + r} AS VARCHAR)")
        .mkString(" || '_' || ")
      s"SELECT doc_id, $b AS band, $key AS key FROM $sigCte"
    }.mkString("\n  UNION ALL\n  ")

  private def duckBands: String = duckBandsOf(Bands, RowsPerBand, "sig")

  /** Shared oracle CTE prefix: shingles → minhash signature → LSH bands →
    * distinct candidate pairs. ONE definition so the pairing predicate can
    * never desynchronize across the q51/q53/q58/q87 oracles. The `capped`
    * CTE mirrors [[Dedup.candidatePairs]]'s per-bucket membership cap
    * (keep the 1000 smallest ids) — without it, a corpus with a >1000-member
    * bucket would make the engine and the oracle diverge exactly in the
    * degenerate case the cap exists for.
    */
  private val BucketCap = 1000
  // matBands renders the band table MATERIALIZED — load-bearing when the
  // caller references it 3+ times (q183c: the candidate self-join AND the
  // survivor filter); DuckDB inlines plain CTEs per reference (the q168
  // lesson) and the minhash signature derivation re-expands with each
  private def duckCandCtesWith(capped: Boolean,
                               matBands: Boolean = false): String = {
    val pairSource = if (capped) "capped" else "bands"
    val mat = if (matBands) "MATERIALIZED " else ""
    s"""toks AS (
       |  SELECT DISTINCT doc_id, unnest(list_transform(generate_series(1, len(w)-1), i -> w[i] || ' ' || w[i+1])) AS sh
       |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
       |), sig AS (
       |  SELECT doc_id,
       |    $duckSig
       |  FROM toks GROUP BY doc_id
       |), bands AS $mat(
       |  $duckBands
       |), capped AS (
       |  SELECT doc_id, band, key FROM (
       |    SELECT doc_id, band, key,
       |           row_number() OVER (PARTITION BY band, key ORDER BY doc_id) AS rn
       |    FROM bands
       |  ) WHERE rn <= $BucketCap
       |), cand AS (
       |  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
       |  FROM $pairSource l JOIN $pairSource r
       |    ON l.band = r.band AND l.key = r.key AND l.doc_id < r.doc_id
       |)""".stripMargin
  }
  private def duckCandCtes: String = duckCandCtesWith(capped = true)

  /** MinHash (seeded portable hashes over word 2-shingles) + banded LSH
    * with corpus-adaptive geometry (8 bands × 2 rows at verify scale, per
    * [[Dedup.lshGeometry]]'s log₂ law): near-duplicate candidate pairs
    * generated by a self-join on the band key — within buckets only,
    * never all-pairs.
    */
  val q51MinhashLsh = Q.checked(
    "q51_minhash_lsh",
    s"WITH $duckCandCtes\nSELECT a, b FROM cand") { (s, dir) =>
    val docs = table(s, dir, "documents")
    Dedup.candidatePairs(autoBands(docs), BucketCap).select(col("a"), col("b"))
  }

  private val SimBits = 16

  private def duckSimSums: String =
    (0 until SimBits).map(b => s"sum(((h>>$b)&1)*2-1) AS s$b").mkString(",\n    ")

  private def duckSimSig: String =
    (0 until SimBits).map(b => s"(CASE WHEN s$b > 0 THEN ${1L << b} ELSE 0 END)").mkString(" + ")

  /** SimHash 16-bit signatures over distinct word tokens. */
  val q52Simhash = Q.checked(
    "q52_simhash",
    s"""WITH toks AS (
       |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
       |), h AS (
       |  SELECT doc_id, ('0x'||substring(md5(tok),1,8))::BIGINT AS h FROM toks
       |), s AS (
       |  SELECT doc_id,
       |    $duckSimSums
       |  FROM h GROUP BY doc_id
       |)
       |SELECT doc_id, $duckSimSig AS simhash FROM s""") { (s, dir) =>
    Dedup.simhash(table(s, dir, "documents"), col("doc_id"),
      Dedup.tokens(col("text")), SimBits)
      .select(col("id").as("doc_id"), col("simhash"))
  }

  /** n-gram Jaccard verification over the LSH candidate pairs: exact
    * |A∩B|/|A∪B| on distinct unigram token sets, near-dups at >= 0.9.
    * Candidates come from the banded-LSH bucket join (q51), so the
    * verification cost is bounded by bucket sizes, not n².
    */
  val q53Jaccard = Q.checked(
    "q53_jaccard",
    s"""WITH $duckCandCtes, uni AS (
       |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
       |), sizes AS (
       |  SELECT doc_id, count(*) AS n FROM uni GROUP BY doc_id
       |), common AS (
       |  SELECT c.a, c.b, count(*) AS c
       |  FROM cand c
       |  JOIN uni ua ON ua.doc_id = c.a
       |  JOIN uni ub ON ub.doc_id = c.b AND ub.tok = ua.tok
       |  GROUP BY c.a, c.b
       |)
       |SELECT m.a, m.b, CAST(m.c AS DOUBLE) / (sa.n + sb.n - m.c) AS jaccard
       |FROM common m
       |JOIN sizes sa ON sa.doc_id = m.a
       |JOIN sizes sb ON sb.doc_id = m.b
       |WHERE CAST(m.c AS DOUBLE) / (sa.n + sb.n - m.c) >= 0.5""") { (s, dir) =>
    val docs = table(s, dir, "documents")
    val cand = Dedup.candidatePairs(autoBands(docs), BucketCap)
    val uni = docs.select(col("doc_id").as("id"), explode(Dedup.tokens(col("text"))).as("tok"))
      .distinct()
    Dedup.jaccard(cand, uni).filter(col("jaccard") >= 0.5)
  }

  /** Near-dup GROUP assembly — the step after candidate generation in a
    * real dedup pipeline: connected components over the LSH candidate
    * pairs (min-label propagation to fixpoint), emitting doc → component
    * (= keeper id) plus a keep flag. The oracle computes the identical
    * transitive closure with a recursive CTE over the same candidate
    * pairs, so a green row proves the clustering, not just the pair list.
    */
  val q58DedupGroups = Q.checked(
    "q58_dedup_groups",
    s"""WITH RECURSIVE ${duckCandCtesWith(capped = false)}, edges AS (
       |  SELECT a, b FROM cand UNION SELECT b AS a, a AS b FROM cand
       |), reach AS (
       |  SELECT DISTINCT a AS id, a AS lbl FROM edges
       |  UNION
       |  SELECT e.a AS id, r.lbl FROM edges e JOIN reach r ON r.id = e.b
       |)
       |SELECT id AS doc_id, min(lbl) AS component,
       |       CAST(id = min(lbl) AS BOOLEAN) AS keep
       |FROM reach GROUP BY id""") { (s, dir) =>
    val docs = table(s, dir, "documents")
    // star-contracted bucket edges: same components as the pair graph
    // (the oracle proves it — its closure runs over the full UNCAPPED
    // pair list: group assembly is deliberately cap-free, so its oracle
    // must be too) at bucket-linear instead of bucket-quadratic volume
    val edges = Dedup.bucketStarEdges(autoBands(docs))
    Dedup.connectedComponents(edges)
      .select(col("id").as("doc_id"), col("lbl").as("component"),
        (col("id") === col("lbl")).as("keep"))
  }

  /** Quality-aware dedup keeper — the production refinement of q58's
    * min-id rule: within each near-dup component keep the LONGEST
    * member (n_chars DESC, doc_id tiebreak — the CCNet/C4 "keep the
    * best copy, not the first" policy; swap any integer quality signal
    * into the same argmax). The argmax is a pure
    * `min(struct(-n_chars, doc_id))` aggregation per component (the
    * q142 pattern — combiner-friendly at any clique size, no
    * per-component window); the oracle extends q58's recursive-closure
    * CTE with a ranked keeper join. Semantics follow q58: only docs
    * with at least one candidate edge appear (singletons have nothing
    * to dedup against).
    */
  val q158BestKeeper = Q.checked(
    "q158_best_keeper",
    s"""WITH RECURSIVE ${duckCandCtesWith(capped = false)}, edges AS (
       |  SELECT a, b FROM cand UNION SELECT b AS a, a AS b FROM cand
       |), reach AS (
       |  SELECT DISTINCT a AS id, a AS lbl FROM edges
       |  UNION
       |  SELECT e.a AS id, r.lbl FROM edges e JOIN reach r ON r.id = e.b
       |), comp AS (
       |  SELECT id AS doc_id, min(lbl) AS component FROM reach GROUP BY id
       |), q AS (
       |  SELECT c.doc_id, c.component, d.n_chars
       |  FROM comp c JOIN documents d USING (doc_id)
       |), k AS (
       |  SELECT component, doc_id AS keeper FROM (
       |    SELECT component, doc_id,
       |      row_number() OVER (PARTITION BY component
       |        ORDER BY n_chars DESC, doc_id) AS rn
       |    FROM q) WHERE rn = 1)
       |SELECT q.doc_id, q.component, q.n_chars,
       |  CAST(q.doc_id = k.keeper AS BOOLEAN) AS keep
       |FROM q JOIN k USING (component)""") { (s, dir) =>
    val docs = table(s, dir, "documents")
    val comp = Dedup.connectedComponents(Dedup.bucketStarEdges(autoBands(docs)))
      .select(col("id").as("doc_id"), col("lbl").as("component"))
      .join(docs.select(col("doc_id"), col("n_chars")), "doc_id")
      .localCheckpoint(true) // feeds the argmax and the final join
    val keeper = comp
      .groupBy(col("component"))
      .agg(min(struct((-col("n_chars")).as("negq"), col("doc_id"))).as("top"))
      .select(col("component"), col("top.doc_id").as("keeper"))
    comp.join(keeper, "component")
      .select(col("doc_id"), col("component"), col("n_chars"),
        (col("doc_id") === col("keeper")).as("keep"))
  }

  /** The APPLY step of dedup — what the pipeline actually ships: keepers
    * (min doc_id per exact-hash group over the simulated re-crawl) are
    * semi-joined back onto the corpus and the surviving set is summarized
    * per language. Completes the dedup story end-to-end: candidates
    * (q51) → groups (q58) → filtered corpus (here, on the exact-dup
    * relation where the keeper set is deterministic).
    */
  val q59DedupApply = Q.checked(
    "q59_dedup_apply",
    s"""WITH $duckCrawlCte, keep AS (
      |  SELECT md5(text) AS h, min(doc_id) AS keep_id FROM crawl GROUP BY 1
      |)
      |SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars
      |FROM crawl c JOIN keep k ON md5(c.text) = k.h AND c.doc_id = k.keep_id
      |GROUP BY lang""") { (s, dir) =>
    val cr = crawl(table(s, dir, "documents"))
    val keep = cr.groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("keep_id"))
    cr.join(keep,
      md5(col("text")) === col("h") && col("doc_id") === col("keep_id"),
      "left_semi")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))
  }

  /** Embedding-cosine near-duplicate detection: candidate pairs from
    * shared SRP-LSH buckets (never all-pairs), exact decimal cosine, pairs
    * above 0.4 are near-dups. Completes the dedup matrix: exact /
    * MinHash-LSH / SimHash / n-gram Jaccard / embedding-cosine.
    */
  val q57EmbedDedup: Q = {
    import graft.operators.Similarity
    // the oracle re-derives the SRP geometry in SQL from count(*)
    // (Similarity.srpOracleBucketCtes — the same min-p plane scan and
    // md5-parity signs as the Spark body's srpPlanesFor/srpSigns), so
    // both engines agree at EVERY corpus scale. Dedup stays single-
    // bucket (no probing): a missed near-dup pair costs recall, not
    // correctness, and the group step (q58 pattern) is transitive.
    Q.checked(
      "q57_embed_dedup",
      s"""WITH ${Similarity.srpOracleBucketCtes(64)},
         |cand AS (
         |  SELECT l.vec_id AS a, r.vec_id AS b
         |  FROM b l JOIN b r ON l.bucket = r.bucket AND l.vec_id < r.vec_id
         |), dots AS (
         |  SELECT c.a, c.b,
         |    CAST(sum(ea.v * eb.v) AS DOUBLE) AS dqx,
         |    CAST(sum(ea.v * ea.v) AS DOUBLE) AS dqq,
         |    CAST(sum(eb.v * eb.v) AS DOUBLE) AS dxx
         |  FROM cand c JOIN el ea ON ea.vec_id = c.a
         |  JOIN el eb ON eb.vec_id = c.b AND eb.d = ea.d
         |  GROUP BY c.a, c.b
         |)
         |SELECT a, b, dqx / (sqrt(dqq) * sqrt(dxx)) AS cos
         |FROM dots WHERE dqx / (sqrt(dqq) * sqrt(dxx)) >= 0.4""") { (s, dir) =>
      val emb = table(s, dir, "embeddings")
      val sg = Similarity.srpSigns(Similarity.srpPlanesFor(emb.count()), 64)
      // quantize once per row; the bucket join carries only the scaled
      // array, and per-pair scoring is pure integer multiply-adds
      val withBucket = emb
        .select(col("vec_id"), Similarity.scaled(col("embedding")).as("sv"))
        .select(col("vec_id"), col("sv"),
          Similarity.srpBucketScaled(col("sv"), sg).as("bucket"),
          sqrt(Similarity.dotScaled(col("sv"), col("sv")).cast("double")).as("norm"))
      val cand = withBucket.alias("l")
        .join(withBucket.alias("r"),
          col("l.bucket") === col("r.bucket") && col("l.vec_id") < col("r.vec_id"))
        .select(col("l.vec_id").as("a"), col("r.vec_id").as("b"),
          (Similarity.dotScaled(col("l.sv"), col("r.sv")).cast("double") /
            (col("l.norm") * col("r.norm"))).as("cos"))
      cand.filter(col("cos") >= 0.4)
    }
  }

  /** Triangle count over the near-dup candidate graph — the classic
    * graph-analytics probe of clustering structure (a triangle = three
    * documents pairwise near-dup candidates). Pairs are oriented a < b at
    * generation, so each triangle a < b < c is counted exactly once, at
    * its lowest edge (a,b), as `c ∈ N⁺(a) ∩ N⁺(b)`.
    *
    * Shape: adjacency-list intersection, NOT a two-hop self-join. The
    * join-closure plan (e1⋈e2 on b, probed by e3) materializes and
    * SHUFFLES one row per two-hop path — Σ C(outdeg, 2) rows, which on a
    * clique-heavy dedup graph (exactly what near-dup candidates look
    * like) is quadratic in clique size: the 10× soak measured 237 s where
    * sf0.1 took 2.4 s. Here out-neighborhoods are aggregated ONCE into
    * sorted arrays (out-degree is bounded by bands × the candidatePairs
    * bucket cap, so the buffer is bounded), each edge joins its two
    * endpoint lists — two equi-joins, rows = |E|, never a row per path —
    * and the codegen'd `array_intersect` counts closures with nothing
    * wider than an edge ever hitting a shuffle. Same 10× soak: 72 s —
    * the remaining cost is Σ(deg(a)+deg(b)) over edges, the intersection
    * work itself, which is inherent to the clique-heavy replicated
    * corpus (every dup group is a 10×-bigger clique, and a k-clique owns
    * C(k,3) triangles — the COUNT explodes cubically, so this fixture is
    * the adversarial case, not the organic one). Identical CTE closure
    * on the oracle side.
    */
  val q87Triangles = Q.checked(
    "q87_triangles",
    s"""WITH $duckCandCtes
       |SELECT count(*) AS triangles
       |FROM cand e1
       |JOIN cand e2 ON e2.a = e1.b
       |JOIN cand e3 ON e3.a = e1.a AND e3.b = e2.b""") { (s, dir) =>
    val docs = table(s, dir, "documents")
    val cand = Dedup.candidatePairs(autoBands(docs), BucketCap)
    val adj = cand.groupBy(col("a")).agg(sort_array(collect_list(col("b"))).as("nbrs"))
    cand
      .join(adj.select(col("a").as("_ja"), col("nbrs").as("na")),
        col("a") === col("_ja"))
      .join(adj.select(col("a").as("_jb"), col("nbrs").as("nb")),
        col("b") === col("_jb"), "left")
      .agg(coalesce(
        sum(size(array_intersect(col("na"),
          coalesce(col("nb"), array().cast("array<bigint>"))))),
        lit(0L)).as("triangles"))
  }

  /** PageRank over the bipartite user ↔ event-type graph — the iterative
    * propagation family (distinct from q58's pointer-jumping CC and
    * q87's triangle closure): entity importance by random walk, the
    * standard "which users/types dominate the interaction graph" signal.
    *
    * Exactness: ranks live in the scaled-long domain (1e6 = 1.0) and
    * every step is integer — per-edge contribution `pr div deg` (floor
    * division, identical in Spark `div` and DuckDB `//` on non-negative
    * longs) and the damping update `150000 + (85 · Σcontrib) div 100`
    * (d = 0.85 exactly). Three iterations, unrolled in the oracle as
    * three CTEs — bit-identical cross-engine, no float ever.
    *
    * Scale shape: the classic Pregel loop — each iteration is ONE
    * shuffle of (dst, contrib) with map-side partial sums; the degree
    * table joins on the same src key; ranks checkpoint per iteration so
    * the plan doesn't nest. Edges are symmetric by construction, so
    * there are no dangling nodes and the walk is well-defined.
    */
  val q127Pagerank = Q.checked(
    "q127_pagerank",
    """WITH pairs AS (SELECT DISTINCT user_id, event_type FROM events),
      |edges AS (
      |  SELECT 'u:' || CAST(user_id AS VARCHAR) AS src, 't:' || event_type AS dst FROM pairs
      |  UNION ALL
      |  SELECT 't:' || event_type, 'u:' || CAST(user_id AS VARCHAR) FROM pairs
      |), deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
      |r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS pr FROM deg),
      |i1 AS (
      |  SELECT e.dst AS node, CAST(150000 + (85 * sum(r.pr // g.d)) // 100 AS BIGINT) AS pr
      |  FROM edges e JOIN r0 r ON r.node = e.src JOIN deg g ON g.src = e.src
      |  GROUP BY e.dst),
      |i2 AS (
      |  SELECT e.dst AS node, CAST(150000 + (85 * sum(r.pr // g.d)) // 100 AS BIGINT) AS pr
      |  FROM edges e JOIN i1 r ON r.node = e.src JOIN deg g ON g.src = e.src
      |  GROUP BY e.dst),
      |i3 AS (
      |  SELECT e.dst AS node, CAST(150000 + (85 * sum(r.pr // g.d)) // 100 AS BIGINT) AS pr
      |  FROM edges e JOIN i2 r ON r.node = e.src JOIN deg g ON g.src = e.src
      |  GROUP BY e.dst)
      |SELECT node, pr FROM i3""") { (s, dir) =>
    val pairs = table(s, dir, "events")
      .select(col("user_id"), col("event_type")).distinct()
    val edges = pairs
      .select(concat(lit("u:"), col("user_id")).as("src"),
        concat(lit("t:"), col("event_type")).as("dst"))
      .unionByName(pairs
        .select(concat(lit("t:"), col("event_type")).as("src"),
          concat(lit("u:"), col("user_id")).as("dst")))
      .localCheckpoint(true) // reused by deg + every iteration
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("d"))
    var ranks = deg.select(col("src").as("node"), lit(1000000L).as("pr"))
    for (_ <- 1 to 3) {
      ranks = edges
        .join(ranks, col("src") === col("node"))
        .join(deg, "src")
        .select(col("dst"), expr("pr div d").as("contrib"))
        .groupBy(col("dst"))
        .agg((lit(150000L) + expr("(85 * sum(contrib)) div 100")).as("pr"))
        .select(col("dst").as("node"), col("pr"))
        .localCheckpoint(true)
    }
    ranks
  }

  /** Exact set-similarity self-join ([[Dedup.setSimJoin]], AllPairs/
    * PPJoin prefix filtering): every document pair with token-set
    * Jaccard ≥ 0.8, exact recall — no LSH, no probability. The engine
    * prunes with frequency-ordered prefixes + the length filter; the
    * oracle finds the same pairs by the BRUTE token join — two
    * independent algorithms, one answer, so a green row proves the
    * prefix pruning lossless on real data (the q63c equivalence style).
    * Integer threshold compare on both sides: 100·|∩| ≥ 80·(na+nb−|∩|).
    */
  val q128SetsimJoin = Q.checked(
    "q128_setsim_join",
    """WITH tok AS (
      |  SELECT DISTINCT doc_id, unnest(regexp_extract_all(text, '\S+')) AS w
      |  FROM documents),
      |sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
      |ov AS (
      |  SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS inter
      |  FROM tok a JOIN tok b ON a.w = b.w AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT ov.a, ov.b, ov.inter, sa.n AS na, sb.n AS nb
      |FROM ov JOIN sz sa ON sa.doc_id = ov.a JOIN sz sb ON sb.doc_id = ov.b
      |WHERE 100 * ov.inter >= 80 * (sa.n + sb.n - ov.inter)""") { (s, dir) =>
    val docs = table(s, dir, "documents")
      .select(col("doc_id").as("id"),
        array_distinct(regexp_extract_all(col("text"), lit("\\S+"), lit(0))).as("toks"))
    Dedup.setSimJoin(docs, 80)
  }

  /** CLIQUE SUMMARY of q128 ([[Dedup.setSimCliqueSummary]]) — the
    * answer production asks of a replica-heavy corpus instead of the
    * enumerated pair list: per distinct-token-set clique, the
    * representative (min id), member count, and how many pairs of the
    * full q128 answer touch the clique — computed ARITHMETICALLY over
    * the representative join (intra m·(m−1)/2, cross m·m′ per
    * qualifying rep pair), never by enumerating members. The dense×100
    * soak's 29.7-billion-row answer becomes a base-sized summary. The
    * oracle derives the same counts from the BRUTE-FORCE pair list +
    * a canonical set key (length-prefixed sorted tokens — the same
    * prefix-code discipline as the engine's collapse key), so a green
    * hash proves the arithmetic attribution equals actually counting
    * the enumerated pairs: a pair inside one clique counts once, a
    * pair across two cliques once per side.
    */
  val q128bSetsimCliques = Q.checked(
    "q128b_setsim_cliques",
    """WITH tok AS (
      |  SELECT DISTINCT doc_id, unnest(regexp_extract_all(text, '\S+')) AS w
      |  FROM documents),
      |sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
      |qual AS (
      |  SELECT ov.a, ov.b
      |  FROM (
      |    SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS inter
      |    FROM tok a JOIN tok b ON a.w = b.w AND a.doc_id < b.doc_id
      |    GROUP BY 1, 2) ov
      |  JOIN sz sa ON sa.doc_id = ov.a JOIN sz sb ON sb.doc_id = ov.b
      |  WHERE 100 * ov.inter >= 80 * (sa.n + sb.n - ov.inter)),
      |cl AS (
      |  SELECT doc_id,
      |    md5(string_agg(CAST(length(w) AS VARCHAR) || ':' || w, '' ORDER BY w)) AS key
      |  FROM tok GROUP BY doc_id),
      |grp AS (SELECT key, min(doc_id) AS rep, count(*) AS members FROM cl GROUP BY key),
      |docrep AS (SELECT c.doc_id, g.rep FROM cl c JOIN grp g ON g.key = c.key),
      |pr AS (
      |  SELECT ra.rep AS repa, rb.rep AS repb
      |  FROM qual JOIN docrep ra ON ra.doc_id = qual.a
      |            JOIN docrep rb ON rb.doc_id = qual.b),
      |touch AS (
      |  SELECT repa AS rep FROM pr
      |  UNION ALL
      |  SELECT repb AS rep FROM pr WHERE repb <> repa)
      |SELECT g.rep, g.members, count(*) AS organic_pairs
      |FROM touch t JOIN grp g ON g.rep = t.rep
      |GROUP BY 1, 2""") { (s, dir) =>
    val docs = table(s, dir, "documents")
      .select(col("doc_id").as("id"),
        array_distinct(regexp_extract_all(col("text"), lit("\\S+"), lit(0))).as("toks"))
    Dedup.setSimCliqueSummary(docs, 80)
  }

  /** Binary-payload dedup COMPOSITION — multimodal columns flowing
    * through the exact-dedup path: deterministic WAV / BMP / PNG payloads
    * are synthesized per document (content class = doc_id % 17, so ~17
    * distinct contents per modality hide behind 500 distinct byte
    * streams), REALLY decoded ([[graft.operators.Multimodal]] sniffs the
    * container by magic bytes), canonicalized to their decoded content,
    * and exact-deduped by content digest — keeper = min id, copy count,
    * and how many DIFFERENT container formats each content appeared in.
    * The same image content is encoded as BMP by some docs and PNG by
    * others, so `formats = 2` rows prove the dedup key is the DECODED
    * content (raw-byte hashing can never merge a BMP with a PNG). The
    * oracle recomputes every canonical string from the generation formula
    * without seeing a byte — green means decode(encode(x)) == x held for
    * every payload AND the dedup semantics match. Scale shape: map-side
    * encode+decode+digest, one groupBy(digest) with combiner — the q50
    * plan with a codec in front.
    */
  val q97BinaryDedup = Q.checked(
    "q97_binary_dedup",
    """WITH g AS (
      |  SELECT doc_id, doc_id % 17 AS c, doc_id % 3 AS f FROM documents
      |), wav AS (
      |  SELECT doc_id, 'wav' AS fmt,
      |    'wav:' || CAST(40 + c % 8 AS VARCHAR) || ':' ||
      |    array_to_string(list_transform(generate_series(0, CAST(40 + c % 8 AS INT) - 1),
      |      k -> CAST((c * 13 + k * 5) % 1201 - 600 AS VARCHAR)), ',') AS canon
      |  FROM g WHERE f = 0
      |), img AS (
      |  SELECT doc_id, CASE WHEN f = 1 THEN 'bmp' ELSE 'png' END AS fmt,
      |    'img:' || CAST(3 + c % 4 AS VARCHAR) || 'x' || CAST(2 + c % 3 AS VARCHAR) || ':' ||
      |    array_to_string(list_transform(generate_series(0, CAST((3 + c % 4) * (2 + c % 3) AS INT) - 1),
      |      i -> CAST(
      |        ((c * 7 + (i % (3 + c % 4)) * 3 + (i // (3 + c % 4))) % 256) * 65536 +
      |        ((c * 5 + (i % (3 + c % 4)) + 2 * (i // (3 + c % 4))) % 256) * 256 +
      |        ((c + (i % (3 + c % 4)) * (i // (3 + c % 4))) % 256) AS VARCHAR)), ',') AS canon
      |  FROM g WHERE f <> 0
      |), u AS (SELECT * FROM wav UNION ALL SELECT * FROM img)
      |SELECT md5(canon) AS digest, min(doc_id) AS keep_id,
      |  count(*) AS copies, count(DISTINCT fmt) AS formats
      |FROM u GROUP BY 1""") { (s, dir) =>
    import s.implicits._
    import graft.operators.Multimodal
    val gen = table(s, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val c = id % 17
        val fmt = (id % 3).toInt
        val bin = fmt match {
          case 0 =>
            val n = (40 + c % 8).toInt
            Multimodal.wavEncode(
              Array.tabulate(n)(k => ((c * 13 + k * 5) % 1201 - 600).toShort), 8000)
          case _ =>
            val w = (3 + c % 4).toInt
            val h = (2 + c % 3).toInt
            val px = Array.tabulate(w * h) { i =>
              val x = i % w
              val y = i / w
              val r = ((c * 7 + x * 3 + y) % 256).toInt
              val g2 = ((c * 5 + x + 2 * y) % 256).toInt
              val b = ((c + x.toLong * y) % 256).toInt
              (r << 16) | (g2 << 8) | b
            }
            val img = Multimodal.BmpImage(w, h, px)
            if (fmt == 1) Multimodal.bmpEncode(img) else Multimodal.pngEncode(img)
        }
        (id, if (fmt == 0) "wav" else if (fmt == 1) "bmp" else "png", bin)
      }).toDF("id", "fmt", "bin")
    Multimodal.contentCanonicalBatched(gen)
      .select(col("id"), col("fmt"), md5(encode(col("canon"), "UTF-8")).as("digest"))
      .groupBy(col("digest"))
      .agg(min(col("id")).as("keep_id"), count(lit(1)).as("copies"),
        countDistinct(col("fmt")).as("formats"))
  }

  /** Snapshot diff — incremental-ingest delta detection between two
    * corpus versions: a full outer join on doc_id comparing content
    * hashes classifies every doc as added / removed / changed (unchanged
    * rows are dropped — at real scale they are ~everything, and the diff
    * must not materialize them). Both engines derive the two snapshots
    * from the same formulas: the BASE misses doc_id%11=3 and carries ' v1'
    * text on doc_id%7=2; the CURRENT misses doc_id%13=5 — so adds, drops,
    * and edits all occur. One shuffle on doc_id; md5 compare, never a
    * text compare, so the wide column stays pruned out of the join.
    */
  val q103SnapshotDiff = Q.checked(
    "q103_snapshot_diff",
    """WITH base AS (
      |  SELECT doc_id, md5(text || CASE WHEN doc_id % 7 = 2 THEN ' v1' ELSE '' END) AS h
      |  FROM documents WHERE doc_id % 11 <> 3),
      |cur AS (
      |  SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 13 <> 5)
      |SELECT coalesce(b.doc_id, c.doc_id) AS doc_id,
      |  CASE WHEN b.doc_id IS NULL THEN 'added'
      |       WHEN c.doc_id IS NULL THEN 'removed'
      |       ELSE 'changed' END AS status
      |FROM base b FULL OUTER JOIN cur c ON b.doc_id = c.doc_id
      |WHERE b.doc_id IS NULL OR c.doc_id IS NULL OR b.h <> c.h""") { (s, dir) =>
    val docs = table(s, dir, "documents")
    val base = docs.filter(col("doc_id") % 11 =!= 3)
      .select(col("doc_id").as("b_id"),
        md5(concat(col("text"),
          when(col("doc_id") % 7 === 2, " v1").otherwise(""))).as("b_h"))
    val cur = docs.filter(col("doc_id") % 13 =!= 5)
      .select(col("doc_id").as("c_id"), md5(col("text")).as("c_h"))
    base.join(cur, col("b_id") === col("c_id"), "full_outer")
      .filter(col("b_id").isNull || col("c_id").isNull ||
        col("b_h") =!= col("c_h"))
      .select(coalesce(col("b_id"), col("c_id")).as("doc_id"),
        when(col("b_id").isNull, "added")
          .when(col("c_id").isNull, "removed")
          .otherwise("changed").as("status"))
  }

  /** URL-level crawl dedup ([[graft.functions.Urls.canonicalize]]): two
    * fetch records of one page must collapse before content dedup ever
    * runs. The corpus has no URL column, so both engines synthesize the
    * SAME messy URL per doc (q98's construction pattern): scheme/host case,
    * default `:443`, trailing slash, param order, `utm_*` noise, and
    * fragment each vary on a different doc_id residue class — so every
    * normalization rule is load-bearing for the hash match (dropping any
    * one changes group shapes). Output: one row per canonical URL with its
    * fetch count and min-doc_id keeper — one map pass + one groupBy, the
    * exact-dedup scale shape.
    */
  val q106UrlDedup = Q.checked(
    "q106_url_dedup",
    """WITH u AS (
      |  SELECT doc_id,
      |    (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'https' END) || '://'
      |    || (CASE WHEN doc_id % 3 = 0
      |          THEN 'WWW.SITE' || CAST(doc_id % 5 AS VARCHAR) || '.EXAMPLE.COM'
      |          ELSE 'www.site' || CAST(doc_id % 5 AS VARCHAR) || '.example.com' END)
      |    || (CASE WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END)
      |    || '/docs/' || CAST(doc_id % 17 AS VARCHAR)
      |    || (CASE WHEN doc_id % 6 = 0 THEN '/' ELSE '' END)
      |    || '?'
      |    || (CASE WHEN doc_id % 2 = 0
      |          THEN 'id=' || CAST(doc_id % 23 AS VARCHAR) || '&ref=' || source
      |          ELSE 'ref=' || source || '&id=' || CAST(doc_id % 23 AS VARCHAR) END)
      |    || (CASE WHEN doc_id % 5 <> 4 THEN '&utm_source=feed&utm_campaign=c1' ELSE '' END)
      |    || (CASE WHEN doc_id % 7 = 0 THEN '#sec' || CAST(doc_id % 3 AS VARCHAR) ELSE '' END)
      |    AS url
      |  FROM documents),
      |c AS (
      |  SELECT doc_id,
      |    lower(regexp_extract(nofrag, '^([A-Za-z]+)://', 1)) AS scheme,
      |    lower(regexp_extract(nofrag, '^[A-Za-z]+://([^/?#]+)', 1)) AS host0,
      |    regexp_extract(nofrag, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1) AS path0,
      |    regexp_extract(nofrag, '\?([^#]*)', 1) AS qs
      |  FROM (SELECT doc_id, regexp_replace(url, '#.*$', '') AS nofrag FROM u)),
      |n AS (
      |  SELECT doc_id,
      |    scheme || '://'
      |    || (CASE WHEN scheme = 'https' THEN regexp_replace(host0, ':443$', '')
      |             WHEN scheme = 'http' THEN regexp_replace(host0, ':80$', '')
      |             ELSE host0 END)
      |    || (CASE WHEN regexp_replace(path0, '/+$', '') = '' THEN '/'
      |             ELSE regexp_replace(path0, '/+$', '') END)
      |    || (CASE WHEN kept = '' THEN '' ELSE '?' || kept END) AS url
      |  FROM (
      |    SELECT doc_id, scheme, host0, path0,
      |      array_to_string(list_sort(list_filter(string_split(qs, '&'),
      |        x -> x <> '' AND NOT starts_with(x, 'utm_'))), '&') AS kept
      |    FROM c))
      |SELECT url, count(*) AS n_fetches, min(doc_id) AS keeper
      |FROM n GROUP BY url""") { (s, dir) =>
    import graft.functions.Urls
    val id = col("doc_id")
    val url = concat(
      when(id % 2 === 0, "HTTPS").otherwise("https"), lit("://"),
      when(id % 3 === 0,
        concat(lit("WWW.SITE"), (id % 5).cast("string"), lit(".EXAMPLE.COM")))
        .otherwise(
          concat(lit("www.site"), (id % 5).cast("string"), lit(".example.com"))),
      when(id % 4 === 0, ":443").otherwise(""),
      lit("/docs/"), (id % 17).cast("string"),
      when(id % 6 === 0, "/").otherwise(""),
      lit("?"),
      when(id % 2 === 0,
        concat(lit("id="), (id % 23).cast("string"), lit("&ref="), col("source")))
        .otherwise(
          concat(lit("ref="), col("source"), lit("&id="), (id % 23).cast("string"))),
      when(id % 5 =!= 4, "&utm_source=feed&utm_campaign=c1").otherwise(""),
      when(id % 7 === 0, concat(lit("#sec"), (id % 3).cast("string"))).otherwise(""))
    table(s, dir, "documents")
      .select(id, Urls.canonicalize(url).as("url"))
      .groupBy(col("url"))
      .agg(count(lit(1)).as("n_fetches"), min(id).as("keeper"))
  }

  /** Incremental near-dup dedup — the daily-ingest shape (the q74b
    * persistence pattern applied to MinHash/LSH): the base corpus's BAND
    * TABLE is built once and persisted; when a delta arrives, signatures
    * are computed ONLY for the delta (1/13th of the corpus here), the
    * persisted bands are read back untouched, and the capped bucket join
    * runs over the union — so each incremental run costs O(|delta|)
    * signature work plus the bucket join, never a corpus re-hash. Output:
    * candidate pairs with at least one delta side (new-vs-old and
    * new-vs-new; old-vs-old was already known to the nightly build). The
    * oracle recomputes the full q51 pipeline in SQL and keeps the
    * delta-involved pairs — parity proves the persisted-union path finds
    * EXACTLY the pairs a from-scratch build would, which is the
    * correctness contract of incremental dedup.
    */
  val q110IncrementalDedup = Q.checked(
    "q110_incremental_dedup",
    s"WITH $duckCandCtes\nSELECT a, b FROM cand WHERE a % 13 = 4 OR b % 13 = 4") { (s, dir) =>
    val docs = table(s, dir, "documents")
    val bandDir = graft.core.Graft.scratch("q110-base-bands")
    // Geometry is PINNED when the index is built — derived from the full
    // corpus estimate at nightly-build time. The delta MUST reuse the
    // index geometry verbatim (band keys are not comparable across
    // geometries); re-deriving from the delta's own count would silently
    // produce a disjoint key space. Re-banding under new geometry is a
    // full rebuild, by definition.
    val (b110, r110) = Dedup.lshGeometry(docs.count())
    // nightly build: base bands persisted (uncapped — the cap is applied
    // at pair time over the union, exactly as the from-scratch q51 does)
    Dedup.lshBands(
      Dedup.minhash(docs.filter(col("doc_id") % 13 =!= 4),
        col("doc_id"), Dedup.bigrams(col("text")), b110 * r110),
      b110, r110)
      .write.mode("overwrite").parquet(bandDir)
    // incremental run: delta-only signature work + persisted read-back.
    // deltaBands appears twice in the plan (union side + semi-join side);
    // recomputing it costs 1/13 of one signature pass, cheaper than an
    // eager checkpoint's blocking materialization at every scale tested.
    val deltaBands = Dedup.lshBands(
      Dedup.minhash(docs.filter(col("doc_id") % 13 === 4),
        col("doc_id"), Dedup.bigrams(col("text")), b110 * r110),
      b110, r110)
    val allBands = s.read.parquet(bandDir).unionByName(deltaBands)
    // Round-9 (from the 100× soak finding that pair LISTING dominates the
    // incremental run): only buckets CONTAINING a delta member can yield a
    // delta-involved pair, so a left-semi join on the bucket key prunes
    // the old-only majority BEFORE the windowed pair listing. On a real
    // daily-ingest corpus (small buckets, delta ≪ base) this skips almost
    // every bucket and makes the run output-bound on genuinely NEW pairs
    // instead of re-listing the nightly build's. The result is identical:
    // old-only buckets produce only old-old pairs, which the delta filter
    // below discards anyway, and the per-bucket cap is unchanged (it
    // applies within each surviving bucket) — the full-rebuild-parity
    // oracle proves it.
    val touched = allBands.join(
      deltaBands.select(col("band"), col("key")).distinct(),
      Seq("band", "key"), "left_semi")
    Dedup.candidatePairs(touched, BucketCap)
      .filter(col("a") % 13 === 4 || col("b") % 13 === 4)
      .select(col("a"), col("b"))
  }

  // Paragraph granularity for q115: the synthetic documents are
  // single-line word streams, so "paragraph" = a fixed 20-word window (the
  // segmenter is policy — newline-split for real corpora; the keep-first
  // semantics are the operator).
  private val SegW = 20

  /** Paragraph-level dedup (CCNet-style, Wenzek et al. 2020): segment
    * every document, hash each segment, keep only the globally FIRST
    * occurrence (min (doc_id, seg_idx)), and re-emit each document as its
    * surviving segments in order plus retention stats. Runs over the
    * doubled crawl so the drop path is real: each +1e6 copy retains
    * nothing, and a handful of base docs share organic segments.
    *
    * Scale shape: segments shuffle on their content hash once for the
    * keeper groupBy (map-side partial agg) and once for the marking join
    * — no all-pairs, no driver path; a boilerplate segment repeated
    * millions of times is a hot JOIN key, which AQE skew-join splits
    * (ScaleSpec's documented preference over manual salting for exactly
    * this shape). The per-doc reassembly groups on doc_id — bounded by
    * document size.
    */
  val q115ParagraphDedup = Q.checked(
    "q115_paragraph_dedup",
    s"""WITH $duckCrawlCte,
       |words AS (SELECT doc_id, string_split(text, ' ') AS w FROM crawl),
       |idx AS (
       |  SELECT doc_id, w,
       |    unnest(generate_series(0, CAST(ceil(len(w) / $SegW.0) AS INT) - 1)) AS seg_idx
       |  FROM words
       |), segs AS (
       |  SELECT doc_id, seg_idx, doc_id * 1000000 + seg_idx AS pk,
       |    array_to_string(w[(seg_idx*$SegW+1):(seg_idx*$SegW+$SegW)], ' ') AS seg
       |  FROM idx
       |), keepers AS (
       |  SELECT md5(seg) AS h, min(pk) AS keeper FROM segs GROUP BY md5(seg)
       |)
       |SELECT s.doc_id, count(*) AS n_segs,
       |  CAST(sum(CASE WHEN s.pk = k.keeper THEN 1 ELSE 0 END) AS BIGINT) AS kept_segs,
       |  CAST(sum(CASE WHEN s.pk = k.keeper THEN 1 ELSE 0 END) AS BIGINT) * 1000000 // count(*) AS retained_ppm,
       |  coalesce(string_agg(CASE WHEN s.pk = k.keeper THEN s.seg END, ' ' ORDER BY s.seg_idx), '') AS clean_text
       |FROM segs s JOIN keepers k ON k.h = md5(s.seg)
       |GROUP BY s.doc_id""") { (s, dir) =>
    val segs = crawl(table(s, dir, "documents"))
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, cast(ceil(size(w) / $SegW.0) as int) - 1), " +
          s"i -> array_join(slice(w, i * $SegW + 1, $SegW), ' '))"))
        .as(Seq("seg_idx", "seg")))
      .withColumn("h", md5(col("seg")))
      .withColumn("pk", col("doc_id") * lit(1000000L) + col("seg_idx"))
    val keepers = segs.groupBy(col("h")).agg(min(col("pk")).as("keeper"))
    segs.join(keepers, Seq("h"))
      .withColumn("keep", col("pk") === col("keeper"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_segs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("kept_segs"),
        expr("array_join(transform(array_sort(collect_list(" +
          "CASE WHEN keep THEN struct(seg_idx, seg) END)), x -> x.seg), ' ')")
          .as("clean_text"))
      .select(col("doc_id"), col("n_segs"), col("kept_segs"),
        expr("kept_segs * 1000000 div n_segs").as("retained_ppm"),
        col("clean_text"))
  }

  /** CDC merge/upsert — `MERGE INTO` semantics (the lakehouse apply step
    * that pairs with q103's snapshot DIFF): a change feed of
    * delete/update/insert ops applied to the current snapshot. Changes
    * are synthesized deterministically on doc_id residues (0→delete,
    * 1→update with new content, 2→insert under a fresh key) so the
    * oracle replays them from the same formula.
    *
    * Scale shape — the part that matters at 100 TB: NOT a full-outer
    * join (which could never broadcast the small change feed and would
    * shuffle the whole snapshot). Upsert-style CDC (the change row
    * carries the full new image, so no old-row values are needed)
    * decomposes into three narrow branches: snapshot LEFT ANTI the
    * touched keys (broadcast — the snapshot never shuffles), plus the
    * update images, plus the inserts. One wide scan, zero wide
    * shuffles.
    */
  val q133MergeUpsert = Q.checked(
    "q133_merge_upsert",
    """WITH snap AS (SELECT doc_id, md5(text) AS content FROM documents),
      |ch AS (
      |  SELECT CASE WHEN doc_id % 10 = 2 THEN doc_id + 1000000 ELSE doc_id END AS key,
      |    CASE doc_id % 10 WHEN 0 THEN 'D' WHEN 1 THEN 'U' ELSE 'I' END AS op,
      |    CASE doc_id % 10 WHEN 1 THEN md5(text || ':v2')
      |         WHEN 2 THEN md5(text || ':new') END AS newc
      |  FROM documents WHERE doc_id % 10 <= 2)
      |SELECT s.doc_id, s.content, 'kept' AS src FROM snap s
      |WHERE s.doc_id NOT IN (SELECT key FROM ch WHERE op IN ('D', 'U'))
      |UNION ALL
      |SELECT key, newc, 'updated' FROM ch WHERE op = 'U'
      |UNION ALL
      |SELECT key, newc, 'inserted' FROM ch WHERE op = 'I'""") { (s, dir) =>
    val docs = table(s, dir, "documents").select(col("doc_id"), col("text"))
    val snap = docs.select(col("doc_id"), md5(col("text")).as("content"))
    val r = col("doc_id") % 10
    val changes = docs.filter(r <= 2).select(
      when(r === 2, col("doc_id") + 1000000L).otherwise(col("doc_id")).as("key"),
      when(r === 0, lit("D")).when(r === 1, lit("U")).otherwise(lit("I")).as("op"),
      when(r === 1, md5(concat(col("text"), lit(":v2"))))
        .when(r === 2, md5(concat(col("text"), lit(":new")))).as("newc"))
      .localCheckpoint(true) // the change feed: three consumers, one pass
    val touched = changes.filter(col("op").isin("D", "U")).select(col("key"))
    val kept = snap.join(broadcast(touched), col("doc_id") === col("key"), "left_anti")
      .select(col("doc_id"), col("content"), lit("kept").as("src"))
    val updated = changes.filter(col("op") === "U")
      .select(col("key").as("doc_id"), col("newc").as("content"),
        lit("updated").as("src"))
    val inserted = changes.filter(col("op") === "I")
      .select(col("key").as("doc_id"), col("newc").as("content"),
        lit("inserted").as("src"))
    kept.unionByName(updated).unionByName(inserted)
  }

  /** Synchronous label propagation (Raghavan et al. 2007) over the q127
    * bipartite user ↔ event-type graph — the community-detection member
    * of the graph family (q58 = pointer-jumping CC, q87 = triangle
    * closure, q127 = random-walk importance): every node starts labeled
    * with itself, and each round adopts the MOST FREQUENT label among its
    * neighbors (count DESC, then lowest label — fully deterministic, no
    * random tiebreak). Three synchronous rounds, unrolled in the oracle
    * as three CTEs; the oracle picks the argmax with a window while the
    * engine uses `min(struct(-count, label))` — a pure aggregation, no
    * per-neighbor-label window anywhere, so a hub node's update is one
    * combiner-friendly groupBy even at 10⁶ degree. Per-round
    * localCheckpoint keeps the lineage flat (the q127 Pregel posture).
    */
  val q142LabelProp = Q.checked(
    "q142_label_prop",
    """WITH pairs AS (SELECT DISTINCT user_id, event_type FROM events),
      |edges AS (
      |  SELECT 'u:' || CAST(user_id AS VARCHAR) AS src, 't:' || event_type AS dst FROM pairs
      |  UNION ALL
      |  SELECT 't:' || event_type, 'u:' || CAST(user_id AS VARCHAR) FROM pairs
      |), l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM edges),
      |c1 AS (
      |  SELECT e.dst, r.lbl, count(*) AS c
      |  FROM edges e JOIN l0 r ON r.node = e.src GROUP BY e.dst, r.lbl),
      |l1 AS (
      |  SELECT dst AS node, lbl FROM (
      |    SELECT dst, lbl, row_number() OVER (PARTITION BY dst ORDER BY c DESC, lbl) AS rn
      |    FROM c1) WHERE rn = 1),
      |c2 AS (
      |  SELECT e.dst, r.lbl, count(*) AS c
      |  FROM edges e JOIN l1 r ON r.node = e.src GROUP BY e.dst, r.lbl),
      |l2 AS (
      |  SELECT dst AS node, lbl FROM (
      |    SELECT dst, lbl, row_number() OVER (PARTITION BY dst ORDER BY c DESC, lbl) AS rn
      |    FROM c2) WHERE rn = 1),
      |c3 AS (
      |  SELECT e.dst, r.lbl, count(*) AS c
      |  FROM edges e JOIN l2 r ON r.node = e.src GROUP BY e.dst, r.lbl),
      |l3 AS (
      |  SELECT dst AS node, lbl FROM (
      |    SELECT dst, lbl, row_number() OVER (PARTITION BY dst ORDER BY c DESC, lbl) AS rn
      |    FROM c3) WHERE rn = 1)
      |SELECT node, lbl FROM l3""") { (s, dir) =>
    val pairs = table(s, dir, "events")
      .select(col("user_id"), col("event_type")).distinct()
    val edges = pairs
      .select(concat(lit("u:"), col("user_id")).as("src"),
        concat(lit("t:"), col("event_type")).as("dst"))
      .unionByName(pairs
        .select(concat(lit("t:"), col("event_type")).as("src"),
          concat(lit("u:"), col("user_id")).as("dst")))
      .localCheckpoint(true) // reused by init + every round
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("lbl", col("node"))
    for (_ <- 1 to 3) {
      labels = edges
        .join(labels, col("src") === col("node"))
        .groupBy(col("dst"), col("lbl")).agg(count(lit(1)).as("c"))
        // argmax by (count DESC, label ASC) as a pure aggregation:
        // struct ordering compares -c first, then lbl
        .groupBy(col("dst"))
        .agg(min(struct((-col("c")).as("nc"), col("lbl"))).as("top"))
        .select(col("dst").as("node"), col("top.lbl").as("lbl"))
        .localCheckpoint(true)
    }
    labels
  }

  /** Cross-source content-overlap matrix — the corpus-contamination
    * report a mixture designer reads before weighting sources (how much
    * of source A is already inside source B): per source, the DISTINCT
    * word-2-shingle set; per source pair (a < b), the shingle
    * intersection and the integer-ppm Jaccard. The reporting granularity
    * is shingles (q51's near-dup currency), so shared boilerplate counts
    * even when no two documents are byte-identical.
    *
    * Scale shape: the shingle→source table is DISTINCT per (shingle,
    * source), so each join key carries at most |sources| rows per side —
    * per-key fanout is bounded by sources² regardless of how hot a
    * shingle is (the 'the the' problem cannot skew this join), and the
    * output is the sources² matrix, tiny. One map-side-combined distinct,
    * one bounded self-join, two bounded count joins.
    */
  val q144SourceOverlap = Q.checked(
    "q144_source_overlap",
    """WITH sh AS (
      |  SELECT DISTINCT source,
      |    unnest(list_transform(generate_series(1, len(w)-1), i -> w[i] || ' ' || w[i+1])) AS s
      |  FROM (SELECT source, string_split(text, ' ') AS w FROM documents)
      |), n AS (SELECT source, count(*) AS n FROM sh GROUP BY source),
      |ov AS (
      |  SELECT a.source AS sa, b.source AS sb, count(*) AS inter
      |  FROM sh a JOIN sh b ON b.s = a.s AND a.source < b.source
      |  GROUP BY 1, 2)
      |SELECT ov.sa, ov.sb, ov.inter, na.n AS na, nb.n AS nb,
      |  (1000000 * ov.inter) // (na.n + nb.n - ov.inter) AS jac_ppm
      |FROM ov JOIN n na ON na.source = ov.sa JOIN n nb ON nb.source = ov.sb""") { (s, dir) =>
    val sh = table(s, dir, "documents")
      .select(col("source"), explode(Dedup.bigrams(col("text"))).as("s"))
      .distinct()
      .localCheckpoint(true) // feeds the self-join and the per-source sizes
    val n = sh.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val right = sh.select(col("source").as("sb"), col("s").as("s2"))
    sh.join(right, col("s") === col("s2") && col("source") < col("sb"))
      .groupBy(col("source").as("sa"), col("sb"))
      .agg(count(lit(1)).as("inter"))
      .join(broadcast(n.select(col("source").as("sa"), col("n").as("na"))), "sa")
      .join(broadcast(n.select(col("source").as("sb"), col("n").as("nb"))), "sb")
      .select(col("sa"), col("sb"), col("inter"), col("na"), col("nb"),
        expr("(1000000 * inter) div (na + nb - inter)").as("jac_ppm"))
  }

  /** Incremental view maintenance — the q133 CDC family applied to an
    * AGGREGATE: a materialized per-(type, day) rollup (count + exact
    * scaled-long sum) is maintained from insert and retract deltas by
    * merging SUFFICIENT STATISTICS — n' = n + n_ins − n_del, sum
    * likewise, groups whose count hits zero vanish — without ever
    * rescanning the base events. At 100 TB this is the difference
    * between touching yesterday's 100-row rollup + today's delta and
    * re-aggregating the corpus; count and sum are the self-maintainable
    * aggregates (min/max need the q74b merge-with-log shape instead).
    *
    * The fixture splits events arithmetically: base = id % 10 ≠ 0,
    * inserts = id % 10 = 0, retracts = base rows with id % 7 = 3. The
    * ORACLE never sees the increments — it aggregates the final logical
    * table `(base \ retracts) ∪ inserts` from scratch — so a green row
    * proves incremental maintenance equals full recomputation exactly:
    * two algorithms, one answer.
    */
  val q155IvmAgg = Q.checked(
    "q155_ivm_agg",
    """WITH fin AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |    CAST(round(CAST(value AS DOUBLE) * 1000000) AS BIGINT) AS v
      |  FROM events
      |  WHERE (event_id % 10 <> 0 AND event_id % 7 <> 3) OR event_id % 10 = 0)
      |SELECT event_type, day, count(*) AS n, CAST(sum(v) AS BIGINT) AS sum_scaled
      |FROM fin GROUP BY event_type, day""") { (s, dir) =>
    val evt = table(s, dir, "events")
    val ev = evt.select(col("event_id"), col("event_type"),
        graft.core.Graft.tsUs(evt).cast("long").as("us"),
        round(col("value").cast("double") * 1000000d).cast("long").as("v"))
      .select(col("event_id"), col("event_type"),
        expr("us div 86400000000").as("day"), col("v"))
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
    // yesterday's materialized rollup + today's deltas — the engine path
    // touches ONLY these aggregates, never the base events again
    val baseAgg = agg(ev.filter(col("event_id") % 10 =!= 0))
      .select(col("event_type"), col("day"), col("n"), col("s"))
    val insAgg = agg(ev.filter(col("event_id") % 10 === 0))
      .select(col("event_type"), col("day"),
        col("n").as("n_ins"), col("s").as("s_ins"))
    val delAgg = agg(ev.filter(col("event_id") % 10 =!= 0 && col("event_id") % 7 === 3))
      .select(col("event_type"), col("day"),
        col("n").as("n_del"), col("s").as("s_del"))
    baseAgg
      .join(insAgg, Seq("event_type", "day"), "full_outer")
      .join(delAgg, Seq("event_type", "day"), "full_outer")
      .select(col("event_type"), col("day"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("n_ins"), lit(0L)) -
          coalesce(col("n_del"), lit(0L))).as("n"),
        (coalesce(col("s"), lit(0L)) + coalesce(col("s_ins"), lit(0L)) -
          coalesce(col("s_del"), lit(0L))).as("sum_scaled"))
      .filter(col("n") > 0)
  }

  /** BFS shortest distance (min-plus propagation) from a source node
    * over the q127 bipartite graph — the remaining named member of the
    * Pregel family (q58 pointer-jumping CC, q127 random-walk, q142
    * mode-propagation): dist(v) relaxes to min(dist(v),
    * min_{u→v} dist(u)+1) each synchronous round, three rounds unrolled
    * in the oracle. Unreached nodes stay absent (no ∞ sentinel to
    * disagree about). Each round is one equi-join + one min aggregation
    * with map-side partial mins; per-round localCheckpoint keeps the
    * lineage flat (the q127 posture).
    */
  val q160BfsDist = Q.checked(
    "q160_bfs_dist",
    """WITH pairs AS (SELECT DISTINCT user_id, event_type FROM events),
      |edges AS (
      |  SELECT 'u:' || CAST(user_id AS VARCHAR) AS src, 't:' || event_type AS dst FROM pairs
      |  UNION ALL
      |  SELECT 't:' || event_type, 'u:' || CAST(user_id AS VARCHAR) FROM pairs
      |), d0 AS (SELECT 't:click' AS node, CAST(0 AS BIGINT) AS dist),
      |d1 AS (
      |  SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM (
      |    SELECT node, dist FROM d0
      |    UNION ALL
      |    SELECT e.dst AS node, r.dist + 1 AS dist
      |    FROM edges e JOIN d0 r ON r.node = e.src) GROUP BY node),
      |d2 AS (
      |  SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM (
      |    SELECT node, dist FROM d1
      |    UNION ALL
      |    SELECT e.dst AS node, r.dist + 1 AS dist
      |    FROM edges e JOIN d1 r ON r.node = e.src) GROUP BY node),
      |d3 AS (
      |  SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM (
      |    SELECT node, dist FROM d2
      |    UNION ALL
      |    SELECT e.dst AS node, r.dist + 1 AS dist
      |    FROM edges e JOIN d2 r ON r.node = e.src) GROUP BY node)
      |SELECT node, dist FROM d3""") { (s, dir) =>
    val pairs = table(s, dir, "events")
      .select(col("user_id"), col("event_type")).distinct()
    val edges = pairs
      .select(concat(lit("u:"), col("user_id")).as("src"),
        concat(lit("t:"), col("event_type")).as("dst"))
      .unionByName(pairs
        .select(concat(lit("t:"), col("event_type")).as("src"),
          concat(lit("u:"), col("user_id")).as("dst")))
      .localCheckpoint(true) // reused every round
    var dist = s.range(1).select(lit("t:click").as("node"), lit(0L).as("dist"))
    for (_ <- 1 to 3) {
      dist = dist
        .unionByName(edges
          .join(dist, col("src") === col("node"))
          .select(col("dst").as("node"), (col("dist") + 1L).as("dist")))
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
        .localCheckpoint(true)
    }
    dist
  }

  /** k-core decomposition (iterative peeling) over the near-dup candidate
    * graph — the DENSITY member of the graph family: q58's components say
    * what is connected, the k-core says what is densely connected (a
    * clique-grade dup cluster survives, a chain of borderline pairs
    * peels away — the same filter that isolates spam/boilerplate rings).
    * Each round drops every node of degree < 3 and restricts edges to
    * survivors; degree loss cascades, so peeling iterates. Three
    * synchronous rounds, unrolled in the oracle (the q142/q160
    * convention); at verify scale every round is load-bearing
    * (441 → 306 → 275 → 258 nodes). Output: surviving doc_ids with
    * their round-3 core degree.
    *
    * Scale shape: per round one degree aggregation (map-side partial)
    * plus two semi joins restricting the edge list — all equi-keyed,
    * node-scale build sides, never a window over a component and never
    * a re-derivation of the LSH pipeline (e0 is checkpointed once).
    * The candidate list itself is the capped q51 bucket join, so a
    * pathological bucket cannot go quadratic on either engine.
    */
  val q168Kcore = Q.checked(
    "q168_kcore",
    // every e_i is referenced twice (its degree filter and the next
    // round) — DuckDB inlines plain CTEs, so without MATERIALIZED the
    // band self-join re-expands exponentially through the peel chain
    // (observed: 78 GB of spill at sf0.1); materializing each round
    // makes the oracle linear like the engine
    s"""WITH $duckCandCtes, e0 AS MATERIALIZED (
       |  SELECT a AS src, b AS dst FROM cand UNION SELECT b AS src, a AS dst FROM cand
       |), k1 AS (SELECT src FROM e0 GROUP BY src HAVING count(*) >= 3),
       |e1 AS MATERIALIZED (SELECT e.src, e.dst FROM e0 e JOIN k1 x ON x.src = e.src JOIN k1 y ON y.src = e.dst),
       |k2 AS (SELECT src FROM e1 GROUP BY src HAVING count(*) >= 3),
       |e2 AS MATERIALIZED (SELECT e.src, e.dst FROM e1 e JOIN k2 x ON x.src = e.src JOIN k2 y ON y.src = e.dst),
       |k3 AS (SELECT src FROM e2 GROUP BY src HAVING count(*) >= 3),
       |e3 AS (SELECT e.src, e.dst FROM e2 e JOIN k3 x ON x.src = e.src JOIN k3 y ON y.src = e.dst)
       |SELECT src AS doc_id, count(*) AS deg FROM e3 GROUP BY src""") { (s, dir) =>
    val docs = table(s, dir, "documents")
    val cand = Dedup.candidatePairs(autoBands(docs))
    var e = cand.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(cand.select(col("b").as("src"), col("a").as("dst")))
      .localCheckpoint(true)
    for (_ <- 1 to 3) {
      val keep = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= 3).select(col("src").as("node"))
        .localCheckpoint(true) // feeds both endpoint restrictions
      e = e
        .join(keep.select(col("node").as("src")), Seq("src"), "left_semi")
        .join(keep.select(col("node").as("dst")), Seq("dst"), "left_semi")
        .localCheckpoint(true)
    }
    e.groupBy(col("src").as("doc_id")).agg(count(lit(1)).as("deg"))
  }

  /** INCREMENTAL connected components — the daily-graph-update answer the
    * CC family needs at 100 TB (q110 is the same claim for candidate
    * PAIRS; this row maintains the COMPONENTS): base-corpus components
    * are computed once and checkpointed, and when the delta batch
    * (doc_id % 10 = 0, the CDC convention) arrives, only the
    * delta-involving star edges are relabeled through the base labels
    * and a CC runs over the CONTRACTED graph — component-ids plus delta
    * nodes, a graph of delta-edge scale, never the full corpus. Mapping
    * back composes the two label layers. Correct because base labels
    * are component-min ids and contraction preserves minima, so the
    * final label is the full-graph component min. The oracle is q58's
    * full-graph recursive closure over the WHOLE corpus — green proves
    * incremental ≡ full recompute, two algorithms one answer.
    *
    * Scale: the base CC never re-runs; the delta CC's edge list is the
    * delta's bucket neighborhoods only. Base docs whose FIRST edge
    * arrives with the delta (edge-less in the base graph) flow through
    * the contracted graph under their own ids — the left-anti split
    * below routes them correctly.
    *
    * GEOMETRY STABILITY (ADVICE r13): the engine fixes LSH geometry at
    * BASE time (lshGeometry(0.9N), the q110 stored-signature convention)
    * while the full-recompute oracle's static CTEs carry the
    * verify-corpus geometry (lshGeometry(500) = 8×2). The two coincide
    * whenever 0.9N and the oracle corpus land on the same lshGeometry
    * step — true across the whole registered range (lshGeometry is
    * constant on [450, 5000], covering 0.9N and N at sf0.001/0.01/0.1).
    * Near a step boundary (e.g. N just above a band-count jump) base
    * and full geometries can straddle the step; the incremental answer
    * is still a correct CC of the BASE-geometry candidate graph, but it
    * is a different graph than a full re-derivation would build — the
    * production posture is exactly q110's: geometry is versioned with
    * the persisted signature/band table and re-derived only on an
    * explicit full rebuild, never silently mid-increment.
    */
  val q183IncrementalCc = Q.checked(
    "q183_incremental_cc",
    s"""WITH RECURSIVE ${duckCandCtesWith(capped = false)}, edges AS (
       |  SELECT a, b FROM cand UNION SELECT b AS a, a AS b FROM cand
       |), reach AS (
       |  SELECT DISTINCT a AS id, a AS lbl FROM edges
       |  UNION
       |  SELECT e.a AS id, r.lbl FROM edges e JOIN reach r ON r.id = e.b
       |)
       |SELECT id AS doc_id, min(lbl) AS component,
       |       CAST(id = min(lbl) AS BOOLEAN) AS keep
       |FROM reach GROUP BY id""") { (s, dir) =>
    val docs = table(s, dir, "documents")
    val base = docs.filter(col("doc_id") % 10 =!= 0)
    // geometry is FIXED at base time (the q110 persisted-band-table
    // convention: the incremental day reuses the stored signatures, it
    // does not re-derive geometry from the grown corpus)
    val (bnd, rpb) = Dedup.lshGeometry(base.count())
    def bandsOf(d: org.apache.spark.sql.DataFrame) =
      Dedup.lshBands(
        Dedup.minhash(d, col("doc_id"), Dedup.bigrams(col("text")), bnd * rpb),
        bnd, rpb)
    // BUILD: base-only components, computed "yesterday" and checkpointed —
    // the artifact production persists (the fixture necessarily rebuilds
    // it in-query; the SERVE half below is what a daily run pays)
    val baseLabels = Dedup.connectedComponents(
        Dedup.bucketStarEdges(bandsOf(base)))
      .localCheckpoint(true)
    // today's full-bucket star edges, restricted to delta involvement
    val deltaEdges = Dedup.bucketStarEdges(bandsOf(docs))
      .filter(col("a") % 10 === 0 || col("b") % 10 === 0)
    // SERVE: contract through base labels, CC the delta-scale graph,
    // compose the label layers back ([[Dedup.ccIncrementalServe]])
    Dedup.ccIncrementalServe(baseLabels, deltaEdges)
      .withColumn("keep", col("doc_id") === col("component"))
  }

  /** q183 through the STREAMING ingest ([[graft.streaming.CcIngest]]) —
    * the dedup family joins the k-NN (q167f) and RAG (q150f) streaming
    * lanes, completing the symmetry: the base dedup index (band table
    * under frozen geometry + component labels) persists through the
    * crash-atomic store, a FRESH ingest resumes from it
    * ([[graft.streaming.CcIngest.resume]] — so this query also pins the
    * save/load hop), and the delta docs arrive as three deterministic
    * micro-batches INCLUDING a replayed duplicate of batch 1, each
    * folding delta-scale star edges ([[Dedup.ccDeltaStarEdges]] — only
    * touched buckets re-window, hub takeovers included) through the
    * contracted CC. The oracle is q183's full-graph recursive closure
    * over the WHOLE corpus, so a green hash proves THREE things at
    * once: chained incremental folds compound to the full recompute,
    * the disk hop is lossless, and an at-least-once replay is invisible
    * to the final components.
    */
  val q183bCcStreaming = Q.checked(
    "q183b_cc_streaming",
    s"""WITH RECURSIVE ${duckCandCtesWith(capped = false)}, edges AS (
       |  SELECT a, b FROM cand UNION SELECT b AS a, a AS b FROM cand
       |), reach AS (
       |  SELECT DISTINCT a AS id, a AS lbl FROM edges
       |  UNION
       |  SELECT e.a AS id, r.lbl FROM edges e JOIN reach r ON r.id = e.b
       |)
       |SELECT id AS doc_id, min(lbl) AS component,
       |       CAST(id = min(lbl) AS BOOLEAN) AS keep
       |FROM reach GROUP BY id""") { (s, dir) =>
    val docs = table(s, dir, "documents")
    val base = docs.filter(col("doc_id") % 10 =!= 0)
    val (bnd, rpb) = Dedup.lshGeometry(base.count())
    val baseBands = Dedup.lshBands(
      Dedup.minhash(base, col("doc_id"), Dedup.bigrams(col("text")), bnd * rpb),
      bnd, rpb).localCheckpoint(true)
    val baseLabels = Dedup.connectedComponents(Dedup.bucketStarEdges(baseBands))
    // BUILD persists; the ingest RESUMES from the committed version —
    // the daily pipeline's actual cross-session shape
    val path = graft.core.Graft.scratch("q183b_cc_index")
    Dedup.ccIndexSave(baseBands, baseLabels, bnd, rpb, base.count(), path)
    val ingest = graft.streaming.CcIngest.resume(s, path)
    val delta = docs.filter(col("doc_id") % 10 === 0)
    val b = (0 until 3).map(r =>
      delta.filter(expr("doc_id div 10") % 3 === r).localCheckpoint(true))
    ingest.foldBatch(b(0), 0L)
    ingest.foldBatch(b(1), 1L)
    ingest.foldBatch(b(1), 1L) // the at-least-once replay — must no-op
    ingest.foldBatch(b(2), 2L)
    ingest.labels
      .select(col("id").as("doc_id"), col("lbl").as("component"),
        (col("id") === col("lbl")).as("keep"))
  }

  /** RETIRE documents from the dedup index, on the board
    * ([[Dedup.ccRetire]] — the parity CcRetireSpec proves, now in the
    * driver's gate currency; the third family's q167g/q150g twin):
    * build the band table + component labels over the full corpus at
    * frozen geometry, tombstone the DELIBERATELY-HARD set — every
    * even-id component REPRESENTATIVE (the bucket-min hubs whose
    * deletion forces hub re-derivation and can SPLIT a component) plus
    * a flat id slice — and emit the retired labels. The oracle is the
    * recursive closure over the SURVIVING band rows, with the tombstone
    * set derived by a FIRST closure inside the same SQL (component
    * minima are engine-independent), so a green hash proves the
    * delta-scale re-solve (affected-component buckets only, never the
    * corpus) equals the full rebuild over survivors — deletion, the
    * weekly GDPR-class production event, under the hash gate at all
    * three scales.
    */
  val q183cCcRetire = Q.checked(
    "q183c_cc_retire",
    // every CTE below that feeds the SECOND closure is MATERIALIZED
    // (the q168 lesson, compounded: without it each reach2 iteration
    // re-expands sband→del→comp→reach and the first closure re-runs
    // inside the second's recursion — observed >30 min at sf0.1;
    // materialized, the whole oracle is two sequential closures, 284 s)
    s"""WITH RECURSIVE ${duckCandCtesWith(capped = false, matBands = true)}, edges AS (
       |  SELECT a, b FROM cand UNION SELECT b AS a, a AS b FROM cand
       |), reach AS (
       |  SELECT DISTINCT a AS id, a AS lbl FROM edges
       |  UNION
       |  SELECT e.a AS id, r.lbl FROM edges e JOIN reach r ON r.id = e.b
       |), comp AS MATERIALIZED (SELECT id, min(lbl) AS c FROM reach GROUP BY id),
       |del AS MATERIALIZED (
       |  SELECT id FROM comp WHERE id = c AND id % 2 = 0
       |  UNION SELECT doc_id AS id FROM documents WHERE doc_id % 10 = 7
       |), sband AS MATERIALIZED (
       |  SELECT doc_id, band, key FROM bands
       |  WHERE doc_id NOT IN (SELECT id FROM del)
       |), cand2 AS MATERIALIZED (
       |  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
       |  FROM sband l JOIN sband r
       |    ON l.band = r.band AND l.key = r.key AND l.doc_id < r.doc_id
       |), edges2 AS (
       |  SELECT a, b FROM cand2 UNION SELECT b AS a, a AS b FROM cand2
       |), reach2 AS (
       |  SELECT DISTINCT a AS id, a AS lbl FROM edges2
       |  UNION
       |  SELECT e.a AS id, r.lbl FROM edges2 e JOIN reach2 r ON r.id = e.b
       |)
       |SELECT id AS doc_id, min(lbl) AS component,
       |       CAST(id = min(lbl) AS BOOLEAN) AS keep
       |FROM reach2 GROUP BY id""") { (s, dir) =>
    val docs = table(s, dir, "documents")
    // geometry frozen at BUILD time over the full corpus (the q110/q183
    // convention — retire never re-derives it from the shrunk corpus)
    val (bnd, rpb) = Dedup.lshGeometry(docs.count())
    val bands = Dedup.lshBands(
      Dedup.minhash(docs, col("doc_id"), Dedup.bigrams(col("text")), bnd * rpb),
      bnd, rpb).localCheckpoint(true)
    val labels = Dedup.connectedComponents(Dedup.bucketStarEdges(bands))
      .localCheckpoint(true) // tombstone derivation AND retire input
    val dels = labels
      .filter(col("id") === col("lbl") && col("id") % 2 === 0)
      .select(col("id"))
      .unionByName(docs.filter(col("doc_id") % 10 === 7)
        .select(col("doc_id").as("id")))
    val (_, labels2) = Dedup.ccRetire(bands, labels, dels)
    labels2.select(col("id").as("doc_id"), col("lbl").as("component"),
      (col("id") === col("lbl")).as("keep"))
  }

  /** The CC family's STALENESS DIAL on the board ([[Dedup.ccStaleness]]
    * — RecallSpec/CcIndexSpec calibrate the arc; this row puts the
    * re-index trigger a scheduler acts on under the hash gate): the
    * geometry frozen at base-build time (the 90% slice, the q183 CDC
    * convention) probed against today's full corpus count. One row —
    * the counts, frozen vs re-derived (bands, rows) geometry, and the
    * stale bit. The oracle re-derives [[Dedup.lshGeometry]]'s log₂ law
    * (r = max(2, ⌈log₂ n / 8⌉), b = max(2, round(0.35^−r))) from the
    * same counts in SQL, so both engines agree at every corpus scale —
    * the IVF-family geometry-macro convention applied to the LSH dial.
    */
  val q183dCcStaleness = Q.checked(
    "q183d_cc_staleness",
    """WITH nb AS (SELECT count(*) AS c FROM documents WHERE doc_id % 10 <> 0),
      |nc AS (SELECT count(*) AS c FROM documents),
      |gb AS (SELECT greatest(2, CAST(ceil(ln(CAST(c AS DOUBLE)) / ln(2.0) / 8.0) AS BIGINT)) AS r FROM nb),
      |gc AS (SELECT greatest(2, CAST(ceil(ln(CAST(c AS DOUBLE)) / ln(2.0) / 8.0) AS BIGINT)) AS r FROM nc),
      |fb AS (SELECT greatest(2, CAST(round(power(0.35, -CAST(r AS DOUBLE))) AS BIGINT)) AS b, r FROM gb),
      |fc AS (SELECT greatest(2, CAST(round(power(0.35, -CAST(r AS DOUBLE))) AS BIGINT)) AS b, r FROM gc)
      |SELECT nc.c AS members, fb.b AS bands_frozen, fb.r AS rows_frozen,
      |  fc.b AS bands_recommended, fc.r AS rows_recommended,
      |  (fc.b <> fb.b OR fc.r <> fb.r) AS stale
      |FROM nc, fb, fc""") { (s, dir) =>
    val docs = table(s, dir, "documents")
    val base = docs.filter(col("doc_id") % 10 =!= 0)
    val (bnd, rpb) = Dedup.lshGeometry(base.count()) // frozen at build
    Dedup.ccStaleness(docs.count(), bnd, rpb)        // probed at today's n
  }

  /** The grown-corpus geometry of the reindex arc, derived (never
    * hand-tuned) at the first step past the 2^16 boundary: the arc's
    * replication pins the grown count into (2^16, 2^17], where
    * [[Dedup.lshGeometry]]'s log₂ law is constant at 23 bands × 3
    * rows — so one oracle string is scale-true for every original
    * corpus of ≤ 65536 docs (all verify scales).
    */
  private val GrownGeom = Dedup.lshGeometry(65537L)

  /** q183e's oracle — shared verbatim by q183f (the [[Dedup
    * .ccMaintain]] gate). Both closures run over the ORIGINAL corpus:
    * identical texts have identical signatures, so the replicated
    * corpus's components are the originals' expanded by pure
    * arithmetic — copies of a doc share ALL its band keys, adding no
    * connectivity between distinct originals, turning former
    * singletons into F-cliques labeled by their original id (minimum
    * of the copy set), and every component's minimum stays the
    * original minimum. n_labeled therefore expands to F × sig-docs
    * and n_components to the distinct coalesce(component, id) count —
    * the oracle pays ONE 69-seed signature over originals instead of
    * F of them. Every CTE feeding a closure is MATERIALIZED (the
    * q183c lesson).
    */
  private def ccReindexOracleSql: String = {
    val (b2, r2) = GrownGeom
    s"""WITH RECURSIVE toks AS MATERIALIZED (
       |  SELECT DISTINCT doc_id, unnest(list_transform(generate_series(1, len(w)-1), i -> w[i] || ' ' || w[i+1])) AS sh
       |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
       |), sig AS MATERIALIZED (
       |  SELECT doc_id,
       |    $duckSig
       |  FROM toks GROUP BY doc_id
       |), bands AS MATERIALIZED (
       |  $duckBands
       |), cand AS MATERIALIZED (
       |  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
       |  FROM bands l JOIN bands r
       |    ON l.band = r.band AND l.key = r.key AND l.doc_id < r.doc_id
       |), edges AS (
       |  SELECT a, b FROM cand UNION SELECT b AS a, a AS b FROM cand
       |), reach AS (
       |  SELECT DISTINCT a AS id, a AS lbl FROM edges
       |  UNION
       |  SELECT e.a AS id, r.lbl FROM edges e JOIN reach r ON r.id = e.b
       |), comp AS MATERIALIZED (SELECT id, min(lbl) AS c FROM reach GROUP BY id),
       |sig2 AS MATERIALIZED (
       |  SELECT doc_id,
       |    ${duckSigOf(b2 * r2)}
       |  FROM toks GROUP BY doc_id
       |), bands2 AS MATERIALIZED (
       |  ${duckBandsOf(b2, r2, "sig2")}
       |), cand2 AS MATERIALIZED (
       |  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
       |  FROM bands2 l JOIN bands2 r
       |    ON l.band = r.band AND l.key = r.key AND l.doc_id < r.doc_id
       |), edges2 AS (
       |  SELECT a, b FROM cand2 UNION SELECT b AS a, a AS b FROM cand2
       |), reach2 AS (
       |  SELECT DISTINCT a AS id, a AS lbl FROM edges2
       |  UNION
       |  SELECT e.a AS id, r.lbl FROM edges2 e JOIN reach2 r ON r.id = e.b
       |), comp2 AS MATERIALIZED (SELECT id, min(lbl) AS c FROM reach2 GROUP BY id),
       |sd AS (SELECT count(DISTINCT doc_id) AS c FROM toks),
       |n AS (SELECT count(*) AS c FROM documents),
       |fr AS (SELECT 65536 // c + 1 AS f FROM n),
       |m AS (SELECT (SELECT f FROM fr) * (SELECT c FROM n) AS c),
       |gb AS (SELECT greatest(2, CAST(ceil(ln(CAST(c AS DOUBLE)) / ln(2.0) / 8.0) AS BIGINT)) AS r FROM n),
       |gc AS (SELECT greatest(2, CAST(ceil(ln(CAST(c AS DOUBLE)) / ln(2.0) / 8.0) AS BIGINT)) AS r FROM m),
       |fb AS (SELECT greatest(2, CAST(round(power(0.35, -CAST(r AS DOUBLE))) AS BIGINT)) AS b, r FROM gb),
       |fc AS (SELECT greatest(2, CAST(round(power(0.35, -CAST(r AS DOUBLE))) AS BIGINT)) AS b, r FROM gc),
       |lb AS (SELECT count(*) AS nl, count(DISTINCT c) AS ncmp FROM comp),
       |la AS (SELECT (SELECT f FROM fr) * (SELECT c FROM sd) AS nl,
       |  (SELECT count(DISTINCT coalesce(c2.c, t.doc_id))
       |   FROM (SELECT DISTINCT doc_id FROM toks) t
       |   LEFT JOIN comp2 c2 ON c2.id = t.doc_id) AS ncmp),
       |dials AS (
       |  SELECT 'before' AS phase, (SELECT c FROM m) AS members,
       |    (SELECT b FROM fb) AS bands_frozen, (SELECT r FROM fb) AS rows_frozen,
       |    (SELECT b FROM fc) AS bands_recommended, (SELECT r FROM fc) AS rows_recommended,
       |    ((SELECT b FROM fc) <> (SELECT b FROM fb)
       |     OR (SELECT r FROM fc) <> (SELECT r FROM fb)) AS stale,
       |    (SELECT nl FROM lb) AS n_labeled, (SELECT ncmp FROM lb) AS n_components
       |  UNION ALL
       |  SELECT 'after', (SELECT c FROM m),
       |    (SELECT b FROM fc), (SELECT r FROM fc),
       |    (SELECT b FROM fc), (SELECT r FROM fc),
       |    FALSE, (SELECT nl FROM la), (SELECT ncmp FROM la))
       |SELECT phase, members, bands_frozen, rows_frozen, bands_recommended,
       |  rows_recommended, stale, n_labeled, n_components
       |FROM dials""".stripMargin
  }

  /** The CC REINDEX ARC on the board — q183d's dial is the trigger;
    * the third family's q167i/q150i twin, completing the
    * fire→re-index→clear symmetry: the corpus GROWS ACROSS THE 2^16
    * GEOMETRY STEP (the one decay mode of [[Dedup.lshGeometry]]'s
    * log₂ law — gate-scale growth is id-shifted replication of the
    * corpus, realistic near-dup-heavy growth whose count is all the
    * dial reads), the probe FIRES (8×2 frozen vs 23×3 re-derived at
    * every verify scale), the pipeline re-indexes the grown corpus at
    * the re-derived 69-seed geometry — a REAL full build over 66–70k
    * docs: minhash, 23-band table, star edges, connected components —
    * and the post-reindex probe is QUIET. Each phase row carries the
    * serving label table's row/component counts, so the green hash
    * pins the rebuild's artifacts (the components that come out of
    * the 69-seed signature), not just the config arithmetic.
    */
  val q183eCcReindex = Q.checked(
    "q183e_cc_reindex",
    ccReindexOracleSql) { (s, dir) =>
    val docs = table(s, dir, "documents").select(col("doc_id"), col("text"))
    val n = docs.count()
    val (bnd, rpb) = Dedup.lshGeometry(n) // frozen at build
    val bands = Dedup.lshBands(
      Dedup.minhash(docs, col("doc_id"), Dedup.bigrams(col("text")), bnd * rpb),
      bnd, rpb)
    val labels = Dedup.connectedComponents(Dedup.bucketStarEdges(bands))
      .localCheckpoint(true)
    // growth across the geometry step: F id-shifted corpus copies
    val f = (65536L / n + 1L).toInt
    val cur = (0 until f).map(j => docs.select(
        (col("doc_id") + lit(j.toLong * 100000000L)).as("doc_id"),
        col("text")))
      .reduce(_ unionByName _)
    val curN = n * f
    val before = Dedup.ccPhaseRow("before", curN, bnd, rpb, labels)
    // the geometry dial FIRED — re-index the grown corpus at the
    // re-derived config (the production response the dial schedules)
    val (b2, r2) = Dedup.lshGeometry(curN)
    val bands2 = Dedup.lshBands(
      Dedup.minhash(cur, col("doc_id"), Dedup.bigrams(col("text")), b2 * r2),
      b2, r2)
    val labels2 = Dedup.connectedComponents(Dedup.bucketStarEdges(bands2))
      .localCheckpoint(true)
    val after = Dedup.ccPhaseRow("after", curN, b2, r2, labels2)
    graft.operators.Similarity.phased(before.unionByName(after))
  }

  /** q183e's arc through [[Dedup.ccMaintain]] — the third family's
    * one-call maintenance operator on the board: the base build
    * persists through the crash-atomic store (frozen geometry + labels
    * + the corpus count under the build's definition), and then ONE
    * maintain call probes the dial at the grown corpus's count, fires,
    * re-indexes at the re-derived 69-seed geometry, saves as the new
    * baseline, and probes again — its after row reading the REBUILT
    * label table back from the store. The oracle is q183e's verbatim —
    * green proves the one-call composition reproduces the hand-wired
    * arc, disk hops included.
    */
  val q183fCcMaintain = Q.checked(
    "q183f_cc_maintain",
    ccReindexOracleSql) { (s, dir) =>
    val docs = table(s, dir, "documents").select(col("doc_id"), col("text"))
    val n = docs.count()
    val (bnd, rpb) = Dedup.lshGeometry(n)
    val bands = Dedup.lshBands(
      Dedup.minhash(docs, col("doc_id"), Dedup.bigrams(col("text")), bnd * rpb),
      bnd, rpb).localCheckpoint(true)
    val labels = Dedup.connectedComponents(Dedup.bucketStarEdges(bands))
    val path = graft.core.Graft.scratch("q183f_cc_index")
    Dedup.ccIndexSave(bands, labels, bnd, rpb, n, path)
    val f = (65536L / n + 1L).toInt
    val cur = (0 until f).map(j => docs.select(
        (col("doc_id") + lit(j.toLong * 100000000L)).as("doc_id"),
        col("text")))
      .reduce(_ unionByName _)
    Dedup.ccMaintain(s, path, cur)
  }

  /** WEIGHTED single-source shortest paths (Bellman–Ford relaxation) —
    * the weighted complement of q160's unit-hop BFS, completing the
    * graph family's distance tier: edge cost 1 + (pair activity count
    * mod 7) over the bipartite user↔type graph (deterministic, varied,
    * positive — cheaper paths through less-active links are genuinely
    * preferred over fewer-hop ones, so weights are load-bearing), source
    * = the lexicographically first type node, three synchronous
    * relaxation rounds unrolled in the oracle (the q142/q160
    * convention). Each round is one equi join frontier→edges plus a
    * map-side-combined min — never a per-node window; unreached nodes
    * stay absent, no ∞ sentinel; per-round checkpoint keeps lineage
    * flat.
    */
  val q188WeightedSssp = Q.checked(
    "q188_weighted_sssp",
    """WITH pc AS (
      |  SELECT user_id, event_type, count(*) AS cnt FROM events GROUP BY user_id, event_type),
      |ed AS MATERIALIZED (
      |  SELECT 'u:'||CAST(user_id AS VARCHAR) AS src, 't:'||event_type AS dst,
      |         1 + cnt % 7 AS w FROM pc
      |  UNION ALL
      |  SELECT 't:'||event_type, 'u:'||CAST(user_id AS VARCHAR), 1 + cnt % 7 FROM pc),
      |d0 AS (SELECT 't:'||(SELECT min(event_type) FROM events) AS node,
      |              CAST(0 AS BIGINT) AS dist),
      |d1 AS MATERIALIZED (SELECT node, min(dist) AS dist FROM (
      |  SELECT node, dist FROM d0
      |  UNION ALL
      |  SELECT e.dst, d.dist + e.w FROM d0 d JOIN ed e ON e.src = d.node) GROUP BY node),
      |d2 AS MATERIALIZED (SELECT node, min(dist) AS dist FROM (
      |  SELECT node, dist FROM d1
      |  UNION ALL
      |  SELECT e.dst, d.dist + e.w FROM d1 d JOIN ed e ON e.src = d.node) GROUP BY node),
      |d3 AS (SELECT node, min(dist) AS dist FROM (
      |  SELECT node, dist FROM d2
      |  UNION ALL
      |  SELECT e.dst, d.dist + e.w FROM d2 d JOIN ed e ON e.src = d.node) GROUP BY node)
      |SELECT node, dist FROM d3""") { (s, dir) =>
    import s.implicits._
    val pc = table(s, dir, "events")
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    val w = (lit(1) + col("cnt") % 7).cast("long")
    val ed = pc.select(concat(lit("u:"), col("user_id")).as("esrc"),
        concat(lit("t:"), col("event_type")).as("edst"), w.as("w"))
      .unionByName(pc.select(concat(lit("t:"), col("event_type")).as("esrc"),
        concat(lit("u:"), col("user_id")).as("edst"), w.as("w")))
      .localCheckpoint(true) // three relaxation rounds read it
    // source derived IN the plan from pc (no second events scan), via
    // NULL-propagating concat so an empty/all-null fixture yields the
    // oracle's NULL-node row instead of the string "t:null"
    var d = pc.agg(min(col("event_type")).as("t"))
      .select(concat(lit("t:"), col("t")).as("node"), lit(0L).as("dist"))
    for (_ <- 1 to 3) {
      val relaxed = d.join(ed, d("node") === ed("esrc"))
        .select(col("edst").as("node"), (col("dist") + col("w")).as("dist"))
      d = d.unionByName(relaxed)
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
        .localCheckpoint(true)
    }
    d
  }

  /** k-anonymity audit — the privacy gate a training-data release runs
    * over structured records: group sizes over the quasi-identifier
    * tuple (nation, segment, $1000 balance band) with every group of
    * size < k = 5 flagged re-identifiable. The balance band uses an
    * OFFSET-then-divide ((bal + 1e6) div 1e5 − 10) so negative balances
    * bucket identically on both engines (Spark `div` truncates toward
    * zero, DuckDB `//` floors — adding the offset makes the dividend
    * non-negative where they agree). One map-side-combined aggregation,
    * output bounded by QI-space cardinality.
    */
  val q182KanonAudit = Q.checked(
    "q182_kanon_audit",
    """WITH q AS (
      |  SELECT c_nationkey AS nat, c_mktsegment AS seg,
      |    (CAST(round(CAST(c_acctbal AS DOUBLE) * 100) AS BIGINT) + 1000000) // 100000 - 10 AS band
      |  FROM customer)
      |SELECT nat, seg, band, count(*) AS n,
      |  CAST(CASE WHEN count(*) < 5 THEN 1 ELSE 0 END AS BIGINT) AS at_risk
      |FROM q GROUP BY nat, seg, band""") { (s, dir) =>
    table(s, dir, "customer")
      .select(col("c_nationkey").as("nat"), col("c_mktsegment").as("seg"),
        expr("(CAST(round(CAST(c_acctbal AS DOUBLE) * 100) AS BIGINT) + 1000000) div 100000 - 10")
          .as("band"))
      .groupBy(col("nat"), col("seg"), col("band"))
      .agg(count(lit(1)).as("n"),
        when(count(lit(1)) < 5, 1L).otherwise(0L).as("at_risk"))
  }

  /** Snapshot TIME TRAVEL — the Delta/Iceberg versioned-read shape built
    * from q133's merge decomposition: a base snapshot plus an ordered
    * CDC log (two deterministic batches, the doc_id-residue convention)
    * reconstructs EVERY historical version, and the same query reads the
    * table "as of" version 1 AND version 2 side by side, each row
    * carrying the commit version its content arrived at. Batch 2
    * deliberately chains onto batch 1 — it re-updates a batch-1 update
    * AND updates a batch-1 INSERT — so a green row proves ordered
    * replay, not just two independent merges.
    *
    * Scale shape: each replayed batch is the q133 posture — the
    * snapshot is never shuffled, touched keys ride a broadcast
    * left-anti, upserts append by union; version N costs N such merges
    * over the delta sizes, not N table scans. v1 is checkpointed once
    * and feeds both its own as-of read and the v2 derivation.
    */
  val q170TimeTravel = Q.checked(
    "q170_time_travel",
    """WITH v0 AS (SELECT doc_id, md5(text) AS content, CAST(0 AS BIGINT) AS version FROM documents),
      |b1 AS (
      |  SELECT CASE WHEN doc_id % 10 = 2 THEN doc_id + 1000000 ELSE doc_id END AS key,
      |    CASE doc_id % 10 WHEN 0 THEN 'D' WHEN 1 THEN 'U' ELSE 'I' END AS op,
      |    CASE doc_id % 10 WHEN 1 THEN md5(text || ':v1') WHEN 2 THEN md5(text || ':b1') END AS newc
      |  FROM documents WHERE doc_id % 10 <= 2),
      |v1 AS (
      |  SELECT doc_id, content, version FROM v0
      |  WHERE doc_id NOT IN (SELECT key FROM b1 WHERE op IN ('D', 'U'))
      |  UNION ALL
      |  SELECT key, newc, CAST(1 AS BIGINT) FROM b1 WHERE op IN ('U', 'I')),
      |b2 AS (
      |  SELECT CASE WHEN doc_id % 10 = 2 THEN doc_id + 1000000
      |              WHEN doc_id % 10 = 5 THEN doc_id + 2000000 ELSE doc_id END AS key,
      |    CASE doc_id % 10 WHEN 3 THEN 'D' WHEN 5 THEN 'I' ELSE 'U' END AS op,
      |    CASE doc_id % 10 WHEN 1 THEN md5(text || ':v1b') WHEN 2 THEN md5(text || ':b1v2')
      |         WHEN 4 THEN md5(text || ':v2') WHEN 5 THEN md5(text || ':b2') END AS newc
      |  FROM documents WHERE doc_id % 10 IN (1, 2, 3, 4, 5)),
      |v2 AS (
      |  SELECT doc_id, content, version FROM v1
      |  WHERE doc_id NOT IN (SELECT key FROM b2 WHERE op IN ('D', 'U'))
      |  UNION ALL
      |  SELECT key, newc, CAST(2 AS BIGINT) FROM b2 WHERE op IN ('U', 'I'))
      |SELECT CAST(1 AS BIGINT) AS as_of, doc_id, content, version FROM v1
      |UNION ALL
      |SELECT CAST(2 AS BIGINT) AS as_of, doc_id, content, version FROM v2""") { (s, dir) =>
    val docs = table(s, dir, "documents").select(col("doc_id"), col("text"))
    val r = col("doc_id") % 10
    val v0 = docs.select(col("doc_id"), md5(col("text")).as("content"),
      lit(0L).as("version"))
    def applyBatch(snap: org.apache.spark.sql.DataFrame,
                   ch: org.apache.spark.sql.DataFrame,
                   ver: Long): org.apache.spark.sql.DataFrame = {
      val touched = ch.filter(col("op").isin("D", "U")).select(col("key"))
      val kept = snap.join(broadcast(touched),
        col("doc_id") === col("key"), "left_anti")
      val upserts = ch.filter(col("op").isin("U", "I"))
        .select(col("key").as("doc_id"), col("newc").as("content"),
          lit(ver).as("version"))
      kept.unionByName(upserts)
    }
    val b1 = docs.filter(r <= 2).select(
      when(r === 2, col("doc_id") + 1000000L).otherwise(col("doc_id")).as("key"),
      when(r === 0, lit("D")).when(r === 1, lit("U")).otherwise(lit("I")).as("op"),
      when(r === 1, md5(concat(col("text"), lit(":v1"))))
        .when(r === 2, md5(concat(col("text"), lit(":b1")))).as("newc"))
    val b2 = docs.filter(r.isin(1, 2, 3, 4, 5)).select(
      when(r === 2, col("doc_id") + 1000000L)
        .when(r === 5, col("doc_id") + 2000000L)
        .otherwise(col("doc_id")).as("key"),
      when(r === 3, lit("D")).when(r === 5, lit("I")).otherwise(lit("U")).as("op"),
      when(r === 1, md5(concat(col("text"), lit(":v1b"))))
        .when(r === 2, md5(concat(col("text"), lit(":b1v2"))))
        .when(r === 4, md5(concat(col("text"), lit(":v2"))))
        .when(r === 5, md5(concat(col("text"), lit(":b2")))).as("newc"))
    val v1 = applyBatch(v0, b1, 1L).localCheckpoint(true)
    val v2 = applyBatch(v1, b2, 2L)
    v1.select(lit(1L).as("as_of"), col("doc_id"), col("content"), col("version"))
      .unionByName(v2.select(lit(2L).as("as_of"), col("doc_id"),
        col("content"), col("version")))
  }

  /** Entity resolution / record linkage over STRUCTURED records — the
    * Fellegi–Sunter shape (blocking + per-field agreement weights +
    * threshold) that dedups CRM/user tables the way MinHash dedups
    * documents. Two "systems" are synthesized deterministically from
    * customer (the q106 messy-URL trick, so every rule is load-bearing):
    * system B keeps 2/3 of the entities and perturbs them per seeded
    * hash — 1/10 get a corrupted id number (+1e12: out of any plausible
    * custkey range so it can never alias a REAL entity, yet ≡ 0 mod
    * 1000 so it survives the block key `num mod 1000` while failing
    * the id agreement), 1/5 a
    * corrupted segment, balances drift ±10 cents (agreement window ±5).
    *
    * Linkage: candidate pairs ONLY within a block (equi-join on
    * (nation, num mod 1000) — never all-pairs; at N records the join
    * touches ~N²/(25·1000) pairs, and a structurally hot block is
    * AQE/salting territory like any key join), then integer agreement
    * weights id ±(40/−25), segment ±(15/−10), balance ±(20/−15), match
    * at ≥ 40. Cross-entity block collisions (num vs num+1000) max out
    * at 10 < 40, so the threshold is false-match-proof by construction;
    * corrupted-id records top out at 10 — they surface as the misses a
    * human review queue would see. Scoring is pure map-side codegen.
    */
  /** ONE definition of the two synthesized CRM "systems" and the
    * Fellegi–Sunter agreement score, shared by the match step (q166) and
    * the golden-record apply step (q175) — the duckCandCtes convention
    * applied to record linkage, so the pairing predicate can never
    * desynchronize between the two queries or the two engines.
    */
  private val duckErCtes =
    """base AS (
      |  SELECT c_custkey AS num, c_nationkey AS nat, c_mktsegment AS seg,
      |    CAST(round(CAST(c_acctbal AS DOUBLE) * 100) AS BIGINT) AS bal
      |  FROM customer),
      |a AS (SELECT num * 2 AS a_id, num, nat, seg, bal FROM base),
      |b0 AS (
      |  SELECT num, nat, seg, bal,
      |    ('0x'||substring(md5('er:'||CAST(num AS VARCHAR)),1,8))::BIGINT % 3 AS keep,
      |    ('0x'||substring(md5('ernum:'||CAST(num AS VARCHAR)),1,8))::BIGINT % 10 AS hn,
      |    ('0x'||substring(md5('erseg:'||CAST(num AS VARCHAR)),1,8))::BIGINT % 5 AS hs,
      |    ('0x'||substring(md5('erbal:'||CAST(num AS VARCHAR)),1,8))::BIGINT % 21 AS hb
      |  FROM base),
      |b AS (
      |  SELECT num * 2 + 1 AS b_id,
      |    CASE WHEN hn = 0 THEN num + 1000000000000 ELSE num END AS bnum,
      |    nat AS bnat,
      |    CASE WHEN hs = 0 THEN 'x' || seg ELSE seg END AS bseg,
      |    bal + hb - 10 AS bbal
      |  FROM b0 WHERE keep <> 0),
      |p AS (
      |  SELECT a_id, b_id, num, nat, seg, bal, bnum, bseg, bbal,
      |    (CASE WHEN num = bnum THEN 40 ELSE -25 END) +
      |    (CASE WHEN seg = bseg THEN 15 ELSE -10 END) +
      |    (CASE WHEN abs(bal - bbal) <= 5 THEN 20 ELSE -15 END) AS score
      |  FROM a JOIN b ON nat = bnat AND num % 1000 = bnum % 1000)""".stripMargin

  /** The Spark form of [[duckErCtes]]: (system A, system B) frames. */
  private def erSides(s: org.apache.spark.sql.SparkSession, dir: String) = {
    import graft.functions.Hashing
    val base = table(s, dir, "customer").select(
      col("c_custkey").as("num"), col("c_nationkey").as("nat"),
      col("c_mktsegment").as("seg"),
      round(col("c_acctbal").cast("double") * 100).cast("long").as("bal"))
    def h(p: String) =
      Hashing.hash32(concat(lit(p), col("num").cast("string")))
    val a = base.select((col("num") * 2).as("a_id"), col("num"),
      col("nat"), col("seg"), col("bal"))
    val b = base
      .withColumn("keep", h("er:") % 3)
      .withColumn("hn", h("ernum:") % 10)
      .withColumn("hs", h("erseg:") % 5)
      .withColumn("hb", h("erbal:") % 21)
      .filter(col("keep") =!= 0)
      .select((col("num") * 2 + 1).as("b_id"),
        when(col("hn") === 0, col("num") + 1000000000000L)
          .otherwise(col("num")).as("bnum"),
        col("nat").as("bnat"),
        when(col("hs") === 0, concat(lit("x"), col("seg")))
          .otherwise(col("seg")).as("bseg"),
        (col("bal") + col("hb") - 10).as("bbal"))
    (a, b)
  }

  /** Blocked candidate pairs of both systems with the agreement score —
    * the shared middle of q166/q175.
    */
  private def erPairs(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val (a, b) = erSides(s, dir)
    val score =
      when(col("num") === col("bnum"), 40).otherwise(-25) +
        when(col("seg") === col("bseg"), 15).otherwise(-10) +
        when(abs(col("bal") - col("bbal")) <= 5, 20).otherwise(-15)
    a.join(b, col("nat") === col("bnat") &&
        col("num") % 1000 === col("bnum") % 1000)
      .withColumn("score", score.cast("long"))
  }

  val q166EntityResolution = Q.checked(
    "q166_entity_resolution",
    s"""WITH $duckErCtes
      |SELECT a_id, b_id, CAST(score AS BIGINT) AS score,
      |  CAST(CASE WHEN score >= 40 THEN 1 ELSE 0 END AS BIGINT) AS matched
      |FROM p""".stripMargin) { (s, dir) =>
    erPairs(s, dir)
      .select(col("a_id"), col("b_id"), col("score"))
      .withColumn("matched",
        when(col("score") >= 40, 1L).otherwise(0L))
  }

  /** Golden-record construction — the APPLY step of q166 (the q59-to-q58
    * relationship, for record linkage): matched pairs merge into one
    * survivor record per entity under deterministic survivorship rules
    * (registry id and segment win — system A is the system of record;
    * balance takes `greatest` of the two snapshots), unmatched A records
    * pass through, and unmatched B records (including every
    * corrupted-id miss) surface as `b_only` — the review queue. Match
    * pairs are PROVABLY 1:1 here: every score ≥ 40 includes the +40 id
    * agreement and both systems carry one record per id, so no group-by
    * survivor arbitration is needed — the merge is a join plus two
    * anti joins. Scale shape: the same blocked equi-join as q166 plus
    * two key anti joins; survivorship is pure map-side expression.
    */
  val q175GoldenRecord = Q.checked(
    "q175_golden_record",
    s"""WITH $duckErCtes,
      |m AS (SELECT * FROM p WHERE score >= 40)
      |SELECT a_id AS gid, num, nat, seg, greatest(bal, bbal) AS bal,
      |  CAST(2 AS BIGINT) AS n_sources, 'merged' AS src FROM m
      |UNION ALL
      |SELECT a_id, num, nat, seg, bal, 1, 'a_only' FROM a
      |WHERE a_id NOT IN (SELECT a_id FROM m)
      |UNION ALL
      |SELECT b_id, bnum, bnat, bseg, bbal, 1, 'b_only' FROM b
      |WHERE b_id NOT IN (SELECT b_id FROM m)""".stripMargin) { (s, dir) =>
    val (a, b) = erSides(s, dir)
    val m = erPairs(s, dir).filter(col("score") >= 40)
      .localCheckpoint(true) // feeds the merge and both anti joins
    val merged = m.select(col("a_id").as("gid"), col("num"), col("nat"),
      col("seg"), greatest(col("bal"), col("bbal")).as("bal"),
      lit(2L).as("n_sources"), lit("merged").as("src"))
    val aOnly = a.join(m.select(col("a_id")), Seq("a_id"), "left_anti")
      .select(col("a_id").as("gid"), col("num"), col("nat"), col("seg"),
        col("bal"), lit(1L).as("n_sources"), lit("a_only").as("src"))
    val bOnly = b.join(m.select(col("b_id")), Seq("b_id"), "left_anti")
      .select(col("b_id").as("gid"), col("bnum").as("num"),
        col("bnat").as("nat"), col("bseg").as("seg"), col("bbal").as("bal"),
        lit(1L).as("n_sources"), lit("b_only").as("src"))
    merged.unionByName(aOnly).unionByName(bOnly)
  }

  /** NORMALIZED exact dedup — q50's hash-groupBy behind a text
    * canonicalizer (the C4/CCNet preprocessing step: lowercase, strip
    * punctuation to spaces, collapse runs, trim), so re-encodings of the
    * same content (case flips, injected separators, trailing junk)
    * collapse into one class where byte-exact dedup sees distinct rows.
    * The fixture makes normalization load-bearing with the crawl()
    * convention: every document rides in twice — raw, and an uppercased
    * copy with ' , ' separators and trailing '!!' — and every class must
    * close over both (n = 2 across the board at verify scale).
    *
    * Scale shape: identical to q50 — the normalizer is map-side
    * (three codegen'd string ops), then ONE hash-partitioned groupBy
    * with map-side combine. Regex semantics are the portable subset
    * ([^a-z0-9 ] and ' +' mean the same in Java regex and RE2).
    */
  val q193NormalizedDedup = Q.checked(
    "q193_normalized_dedup",
    """WITH crawl AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, upper(replace(text, ' ', ' , ')) || '!!' FROM documents),
      |norm AS (
      |  SELECT doc_id,
      |    trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS nt
      |  FROM crawl)
      |SELECT md5(nt) AS h, min(doc_id) AS keep_id, count(*) AS n
      |FROM norm GROUP BY md5(nt)""") { (s, dir) =>
    val docs = table(s, dir, "documents").select(col("doc_id"), col("text"))
    val crawl = docs.unionByName(docs.select(
      (col("doc_id") + 1000000L).as("doc_id"),
      concat(upper(expr("replace(text, ' ', ' , ')")), lit("!!")).as("text")))
    val norm = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " "))
    crawl.select(col("doc_id"), md5(norm).as("h"))
      .groupBy(col("h"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n"))
  }

  /** Set-CONTAINMENT join ([[Dedup.containmentJoin]], threshold 0.8 over
    * word-2-shingles) — the subset-duplicate detector q128's Jaccard
    * join structurally misses: a short document quoted whole inside a
    * long one has Jaccard |A|/|B| (arbitrarily small) but containment
    * 1.0. Asymmetric output — (a, b) means "b covers ≥ 80% of a". The
    * engine prunes with A-side-only df-ordered prefixes (the pigeonhole
    * bound applies to the covered side alone; B contributes its full
    * token list — no length filter exists for containment) plus the
    * first-match positional bound on narrow rows before the verify
    * arrays attach (round 15); the oracle finds the same pairs by the
    * brute token join — two algorithms, one answer, proving both prunes
    * lossless.
    */
  val q194ContainmentJoin = Q.checked(
    "q194_containment_join",
    """WITH tok AS (
      |  SELECT DISTINCT doc_id, unnest(list_transform(generate_series(1, len(w)-1), i -> w[i] || ' ' || w[i+1])) AS sh
      |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
      |sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
      |ov AS (
      |  SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS inter
      |  FROM tok a JOIN tok b ON a.sh = b.sh AND a.doc_id <> b.doc_id
      |  GROUP BY 1, 2)
      |SELECT ov.a, ov.b, ov.inter, sa.n AS na
      |FROM ov JOIN sz sa ON sa.doc_id = ov.a
      |WHERE 100 * ov.inter >= 80 * sa.n""") { (s, dir) =>
    val docs = table(s, dir, "documents")
      .select(col("doc_id").as("id"),
        array_distinct(Dedup.bigrams(col("text"))).as("toks"))
    Dedup.containmentJoin(docs, 80)
  }

  /** The NARROW-ROW verify path of [[Dedup.containmentJoin]], forced by
    * a zero broadcast-token budget over a 1-in-3 corpus slice (sized so
    * the forced path stays a board-scale query) — the same parameterized
    * brute-join oracle as q194, so green proves matched-token-count
    * verify ≡ broadcast array_intersect verify ≡ the oracle's token
    * join. This is the verify the operator switches to past
    * [[Dedup.ContainmentBroadcastTokens]], where the df-sorted arrays no
    * longer broadcast: candidates re-join the token table on the token
    * key and |A∩B| is a map-side-combined count of matched rows — no
    * array ever rides a candidate row through a shuffle.
    */
  val q194bContainmentNarrow = Q.checked(
    "q194b_containment_narrow",
    """WITH base AS (SELECT * FROM documents WHERE doc_id % 3 = 0),
      |tok AS (
      |  SELECT DISTINCT doc_id, unnest(list_transform(generate_series(1, len(w)-1), i -> w[i] || ' ' || w[i+1])) AS sh
      |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM base)),
      |sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
      |ov AS (
      |  SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS inter
      |  FROM tok a JOIN tok b ON a.sh = b.sh AND a.doc_id <> b.doc_id
      |  GROUP BY 1, 2)
      |SELECT ov.a, ov.b, ov.inter, sa.n AS na
      |FROM ov JOIN sz sa ON sa.doc_id = ov.a
      |WHERE 100 * ov.inter >= 80 * sa.n""") { (s, dir) =>
    val docs = table(s, dir, "documents")
      .filter(col("doc_id") % 3 === 0)
      .select(col("doc_id").as("id"),
        array_distinct(Dedup.bigrams(col("text"))).as("toks"))
    Dedup.containmentJoin(docs, 80, broadcastTokenBudget = 0L)
  }

  /** MinHash-LSH DECONTAMINATION — the near-duplicate member of the
    * decontamination trio (q96 = exact n-gram overlap, q171 = semantic
    * cosine, this = syntactic near-dup): corpus documents whose bigram
    * Jaccard against ANY eval-slice document reaches 0.5 are flagged
    * with hit count and the deterministic argmax offender — catches the
    * lightly-edited eval copy that shares no exact 8-gram run but is
    * plainly the same text. The fixture injects real contamination
    * (each eval doc re-enters the corpus truncated by 5 words under a
    * new id) so the flag set is load-bearing, and the geometry is the
    * corpus-derived q51 LSH — candidates only where an eval band bucket
    * meets a corpus band bucket, never eval×corpus.
    *
    * Scale shape: the eval side of the bucket join is eval-sized
    * (broadcast-able); the corpus side is the q51 band table production
    * already maintains — decontamination rides the EXISTING index. The
    * verify intersects bigram-set arrays per candidate (q128's verify
    * shape); output is per-flagged-doc via one combiner-friendly
    * argmax aggregation.
    */
  val q198LshDecontaminate = Q.checked(
    "q198_lsh_decontaminate",
    s"""WITH crawl AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 2000000,
       |    array_to_string((string_split(text,' '))[1:greatest(len(string_split(text,' ')) - 5, 1)], ' ')
       |  FROM documents WHERE doc_id % 97 = 0),
       |toks AS (
       |  SELECT DISTINCT doc_id, unnest(list_transform(generate_series(1, len(w)-1), i -> w[i] || ' ' || w[i+1])) AS sh
       |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM crawl)
       |), sig AS (
       |  SELECT doc_id,
       |    $duckSig
       |  FROM toks GROUP BY doc_id
       |), bands AS (
       |  $duckBands
       |), cand AS (
       |  SELECT DISTINCT e.doc_id AS eid, c.doc_id AS cid
       |  FROM bands e JOIN bands c ON e.band = c.band AND e.key = c.key
       |  WHERE e.doc_id % 97 = 0 AND e.doc_id < 1000000
       |    AND NOT (c.doc_id % 97 = 0 AND c.doc_id < 1000000)
       |), ov AS (
       |  SELECT cand.cid, cand.eid, count(*) AS inter
       |  FROM cand JOIN toks a ON a.doc_id = cand.cid
       |  JOIN toks b ON b.doc_id = cand.eid AND b.sh = a.sh
       |  GROUP BY 1, 2
       |), sz AS (SELECT doc_id, count(*) AS n FROM toks GROUP BY doc_id),
       |j AS (
       |  SELECT ov.cid AS doc_id, ov.eid,
       |    CAST(ov.inter * 1000000 // (sa.n + sb.n - ov.inter) AS BIGINT) AS jac_ppm
       |  FROM ov JOIN sz sa ON sa.doc_id = ov.cid JOIN sz sb ON sb.doc_id = ov.eid
       |  WHERE 2 * ov.inter >= sa.n + sb.n - ov.inter),
       |r AS (
       |  SELECT doc_id, eid, jac_ppm,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY jac_ppm DESC, eid) AS rn,
       |    count(*) OVER (PARTITION BY doc_id) AS n_hits
       |  FROM j)
       |SELECT doc_id, CAST(n_hits AS BIGINT) AS n_hits, eid AS top_eid, jac_ppm AS top_jac_ppm
       |FROM r WHERE rn = 1""") { (s, dir) =>
    val docs = table(s, dir, "documents").select(col("doc_id"), col("text"))
    val w = split(col("text"), " ")
    val crawl = docs.unionByName(docs.filter(col("doc_id") % 97 === 0)
      .select((col("doc_id") + 2000000L).as("doc_id"),
        concat_ws(" ", slice(w, lit(1), greatest(size(w) - 5, lit(1)))).as("text")))
      .localCheckpoint(true) // feeds count, bands, and the verify sets
    val (b, r) = Dedup.lshGeometry(crawl.count())
    val bands = Dedup.lshBands(
      Dedup.minhash(crawl, col("doc_id"), Dedup.bigrams(col("text")), b * r), b, r)
      .localCheckpoint(true) // both sides of the bucket join
    // lshBands emits the id column as `id`
    val isEval = (col("id") % 97 === 0) && (col("id") < 1000000L)
    val cand = bands.filter(isEval)
      .select(col("id").as("eid"), col("band"), col("key"))
      .join(bands.filter(!isEval)
        .select(col("id").as("cid"), col("band"), col("key")), Seq("band", "key"))
      .select(col("eid"), col("cid")).distinct()
    val sets = crawl.select(col("doc_id"),
      array_distinct(Dedup.bigrams(col("text"))).as("toks"))
    val j = cand
      .join(sets.select(col("doc_id").as("cid"), col("toks").as("ta")), "cid")
      .join(sets.select(col("doc_id").as("eid"), col("toks").as("tb")), "eid")
      .withColumn("inter", size(array_intersect(col("ta"), col("tb"))).cast("long"))
      .withColumn("uni", size(col("ta")) + size(col("tb")) - col("inter"))
      .filter(lit(2) * col("inter") >= col("uni"))
      .select(col("cid").as("doc_id"), col("eid"),
        expr("inter * 1000000 div uni").as("jac_ppm"))
    j.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"),
        max(struct(col("jac_ppm"), (-col("eid")).as("neid"))).as("m"))
      .select(col("doc_id"), col("n_hits"),
        (-col("m.neid")).as("top_eid"), col("m.jac_ppm").as("top_jac_ppm"))
  }

  /** PERSONALIZED PageRank — q127's random walk with teleport pinned to
    * a SEED node (the lexicographically first event type) instead of the
    * uniform vector: "importance relative to THIS entity", the
    * recommendation/expansion primitive (related users of a topic,
    * related items of a product). Same integer-exact arithmetic as q127
    * (pr div deg contributions, 85/100 damping), but the teleport mass
    * 150000 lands ONLY on the seed, injected as a union row so the seed
    * survives even when no walk returns to it. Ranks stay SPARSE — only
    * nodes the walk has reached carry rows (on the bipartite graph the
    * frontier genuinely alternates sides per power-iteration step: a
    * node's next mass is exactly teleport + in-contributions, no
    * carryover) — which is the production PPR shape: frontier-sized
    * state, never |V| rows, the point of PPR at graph scale.
    */
  val q196PersonalizedPagerank = Q.checked(
    "q196_personalized_pagerank",
    """WITH pairs AS (SELECT DISTINCT user_id, event_type FROM events),
      |edges AS (
      |  SELECT 'u:' || CAST(user_id AS VARCHAR) AS src, 't:' || event_type AS dst FROM pairs
      |  UNION ALL
      |  SELECT 't:' || event_type, 'u:' || CAST(user_id AS VARCHAR) FROM pairs
      |), deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
      |seed AS (SELECT 't:' || (SELECT min(event_type) FROM events) AS node),
      |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS pr FROM seed),
      |i1 AS (
      |  SELECT node, CAST(sum(pr) AS BIGINT) AS pr FROM (
      |    SELECT e.dst AS node, (85 * sum(r.pr // g.d)) // 100 AS pr
      |    FROM edges e JOIN r0 r ON r.node = e.src JOIN deg g ON g.src = e.src GROUP BY e.dst
      |    UNION ALL SELECT node, 150000 FROM seed) GROUP BY node),
      |i2 AS (
      |  SELECT node, CAST(sum(pr) AS BIGINT) AS pr FROM (
      |    SELECT e.dst AS node, (85 * sum(r.pr // g.d)) // 100 AS pr
      |    FROM edges e JOIN i1 r ON r.node = e.src JOIN deg g ON g.src = e.src GROUP BY e.dst
      |    UNION ALL SELECT node, 150000 FROM seed) GROUP BY node),
      |i3 AS (
      |  SELECT node, CAST(sum(pr) AS BIGINT) AS pr FROM (
      |    SELECT e.dst AS node, (85 * sum(r.pr // g.d)) // 100 AS pr
      |    FROM edges e JOIN i2 r ON r.node = e.src JOIN deg g ON g.src = e.src GROUP BY e.dst
      |    UNION ALL SELECT node, 150000 FROM seed) GROUP BY node)
      |SELECT node, pr FROM i3""") { (s, dir) =>
    val pairs = table(s, dir, "events")
      .select(col("user_id"), col("event_type")).distinct()
      .localCheckpoint(true) // feeds edges AND the seed derivation
    val edges = pairs
      .select(concat(lit("u:"), col("user_id")).as("src"),
        concat(lit("t:"), col("event_type")).as("dst"))
      .unionByName(pairs
        .select(concat(lit("t:"), col("event_type")).as("src"),
          concat(lit("u:"), col("user_id")).as("dst")))
      .localCheckpoint(true) // reused by deg + every iteration
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("d"))
    val seed = pairs.agg(min(col("event_type")).as("t"))
      .select(concat(lit("t:"), col("t")).as("node"))
      .localCheckpoint(true) // injected into every iteration
    var ranks = seed.select(col("node"), lit(1000000L).as("pr"))
    for (_ <- 1 to 3) {
      val contribs = edges
        .join(ranks, col("src") === col("node"))
        .join(deg, "src")
        .select(col("dst"), expr("pr div d").as("contrib"))
        .groupBy(col("dst"))
        .agg(expr("(85 * sum(contrib)) div 100").as("pr"))
        .select(col("dst").as("node"), col("pr"))
      ranks = contribs
        .unionByName(seed.select(col("node"), lit(150000L).as("pr")))
        .groupBy(col("node")).agg(sum(col("pr")).as("pr"))
        .localCheckpoint(true)
    }
    ranks
  }

  /** DEGREE DISTRIBUTION of the near-dup candidate graph — the
    * graph-QA readout run before committing to a CC/k-core pass (a
    * heavy-tailed degree histogram predicts hot components and says
    * whether the bucket cap is binding): per decimal-digit bin
    * (1–9, 10–99, …, the portable integer log scale — no cross-engine
    * float log2 at bin boundaries), the node count and min/max degree.
    * One degree aggregation over the capped q51 candidate list, then a
    * bins-sized rollup — output is log-scale-sized, never graph-sized.
    */
  val q209DegreeDist = Q.checked(
    "q209_degree_dist",
    s"""WITH $duckCandCtes, e AS (
       |  SELECT a AS id FROM cand UNION ALL SELECT b FROM cand
       |), d AS (SELECT id, count(*) AS deg FROM e GROUP BY id)
       |SELECT CAST(length(CAST(deg AS VARCHAR)) AS BIGINT) AS bin,
       |  count(*) AS n_nodes, min(deg) AS min_deg, max(deg) AS max_deg
       |FROM d GROUP BY 1""") { (s, dir) =>
    val docs = table(s, dir, "documents")
    val cand = Dedup.candidatePairs(autoBands(docs))
    cand.select(col("a").as("id"))
      .unionByName(cand.select(col("b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
      .groupBy(length(col("deg").cast("string")).cast("long").as("bin"))
      .agg(count(lit(1)).as("n_nodes"),
        min(col("deg")).as("min_deg"), max(col("deg")).as("max_deg"))
  }

  /** MINHASH CALIBRATION — the sketch-quality audit run before trusting
    * LSH at 100 TB (the sibling of q224's sketch-vs-exact framing, for
    * Jaccard instead of cardinality): for every LSH candidate pair, the
    * signature-agreement ESTIMATE ⌊10⁶·agree/seeds⌋ next to the EXACT
    * bigram Jaccard ⌊10⁶·|A∩B|/|A∪B|⌋ and their signed error. The
    * estimate is free (signatures already exist); the exact value joins
    * shingle sets only for the candidate-scale pair list, never all
    * pairs. A drifting err_ppm distribution is the signal to re-price
    * the LSH geometry. All integer arithmetic, candidate-scale output.
    */
  val q226MinhashCalibration = Q.checked(
    "q226_minhash_calibration",
    s"""WITH $duckCandCtes,
       |sizes AS (SELECT doc_id, count(*) AS n FROM toks GROUP BY 1),
       |agr AS (
       |  SELECT c.a, c.b,
       |    CAST(${(0 until Seeds).map(i => s"(CASE WHEN sa.mh$i = sb.mh$i THEN 1 ELSE 0 END)").mkString(" + ")} AS BIGINT) AS agree
       |  FROM cand c JOIN sig sa ON sa.doc_id = c.a JOIN sig sb ON sb.doc_id = c.b),
       |inter AS (
       |  SELECT c.a, c.b, count(*) AS i
       |  FROM cand c JOIN toks ta ON ta.doc_id = c.a
       |  JOIN toks tb ON tb.doc_id = c.b AND tb.sh = ta.sh
       |  GROUP BY 1, 2)
       |SELECT agr.a, agr.b, agr.agree,
       |  agr.agree * 1000000 // $Seeds AS est_ppm,
       |  coalesce(inter.i, 0) * 1000000 // (na.n + nb.n - coalesce(inter.i, 0)) AS true_ppm,
       |  agr.agree * 1000000 // $Seeds
       |    - coalesce(inter.i, 0) * 1000000 // (na.n + nb.n - coalesce(inter.i, 0)) AS err_ppm
       |FROM agr
       |LEFT JOIN inter ON inter.a = agr.a AND inter.b = agr.b
       |JOIN sizes na ON na.doc_id = agr.a
       |JOIN sizes nb ON nb.doc_id = agr.b""") { (s, dir) =>
    val docs = table(s, dir, "documents")
    val sig = Dedup.minhash(docs, col("doc_id"), Dedup.bigrams(col("text")), Seeds)
      .localCheckpoint(true) // signature-scale; feeds bands and the audit
    val cand = Dedup.candidatePairs(
      Dedup.lshBands(sig, Bands, RowsPerBand), BucketCap)
    val agree = (0 until Seeds)
      .map(i => when(col(s"a_mh$i") === col(s"b_mh$i"), 1L).otherwise(0L))
      .reduce(_ + _)
    val sigA = sig.select(col("id").as("a") +:
      (0 until Seeds).map(i => col(s"mh$i").as(s"a_mh$i")): _*)
    val sigB = sig.select(col("id").as("b") +:
      (0 until Seeds).map(i => col(s"mh$i").as(s"b_mh$i")): _*)
    val agr = cand.join(sigA, "a").join(sigB, "b")
      .select(col("a"), col("b"), agree.as("agree"))
    val toks = docs
      .select(col("doc_id"), explode(Dedup.bigrams(col("text"))).as("sh"))
      .distinct()
      .localCheckpoint(true) // shingle set; feeds sizes and the pair join
    val sizes = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = cand
      .join(toks.select(col("doc_id").as("a"), col("sh")), "a")
      .join(toks.select(col("doc_id").as("b"), col("sh")), Seq("b", "sh"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("i"))
    agr
      .join(inter, Seq("a", "b"), "left")
      .join(sizes.select(col("doc_id").as("a"), col("n").as("na")), "a")
      .join(sizes.select(col("doc_id").as("b"), col("n").as("nb")), "b")
      .select(col("a"), col("b"), col("agree"),
        expr(s"agree * 1000000 DIV $Seeds").as("est_ppm"),
        expr("coalesce(i, 0L) * 1000000 DIV (na + nb - coalesce(i, 0L))").as("true_ppm"),
        (expr(s"agree * 1000000 DIV $Seeds") -
          expr("coalesce(i, 0L) * 1000000 DIV (na + nb - coalesce(i, 0L))")).as("err_ppm"))
  }

  /** DEGREE ASSORTATIVITY of the near-dup candidate graph — q209's
    * degree histogram upgraded to the standard mixing metric (Newman):
    * the Pearson correlation of endpoint degrees over the symmetrized
    * edge list. Positive ⇒ hubs pair with hubs (one dense near-dup
    * blob); negative ⇒ hub-and-spoke (a template with many variants) —
    * it decides whether CC will produce one giant component before you
    * pay for CC. Exact integer sufficient statistics over both edge
    * orientations (q88's recipe; Σx = Σy by symmetry, kept separate so
    * the op tree is the textbook corr), one join of the edge list
    * against the degree table on each endpoint, single-row output.
    */
  val q228Assortativity = Q.checked(
    "q228_assortativity",
    s"""WITH $duckCandCtes,
       |e2 AS (SELECT a AS s, b AS d FROM cand UNION ALL SELECT b, a FROM cand),
       |deg AS (SELECT s AS id, count(*) AS dg FROM e2 GROUP BY s),
       |j AS (
       |  SELECT ds.dg AS x, dd.dg AS y
       |  FROM e2 JOIN deg ds ON ds.id = e2.s JOIN deg dd ON dd.id = e2.d),
       |st AS (
       |  SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
       |    CAST(sum(x*y) AS BIGINT) AS sxy, CAST(sum(x*x) AS BIGINT) AS sxx,
       |    CAST(sum(y*y) AS BIGINT) AS syy
       |  FROM j)
       |SELECT n,
       |  CASE WHEN n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0
       |    THEN CAST(n*sxy - sx*sy AS DOUBLE)
       |         / (sqrt(CAST(n*sxx - sx*sx AS DOUBLE)) * sqrt(CAST(n*syy - sy*sy AS DOUBLE)))
       |  END AS assortativity
       |FROM st""") { (s, dir) =>
    val docs = table(s, dir, "documents")
    val cand = Dedup.candidatePairs(autoBands(docs))
      .localCheckpoint(true) // feeds the symmetrized list twice
    val e2 = cand.select(col("a").as("s"), col("b").as("d"))
      .unionByName(cand.select(col("b").as("s"), col("a").as("d")))
    val deg = e2.groupBy(col("s").as("id")).agg(count(lit(1)).as("dg"))
    val j = e2
      .join(deg.select(col("id").as("s"), col("dg").as("x")), "s")
      .join(deg.select(col("id").as("d"), col("dg").as("y")), "d")
    val st = j.agg(count(lit(1)).as("n"),
      sum(col("x")).cast("long").as("sx"), sum(col("y")).cast("long").as("sy"),
      sum(col("x") * col("y")).cast("long").as("sxy"),
      sum(col("x") * col("x")).cast("long").as("sxx"),
      sum(col("y") * col("y")).cast("long").as("syy"))
    val vx = col("n") * col("sxx") - col("sx") * col("sx")
    val vy = col("n") * col("syy") - col("sy") * col("sy")
    val cov = col("n") * col("sxy") - col("sx") * col("sy")
    st.select(col("n"),
      when(vx > 0 && vy > 0,
        cov.cast("double") / (sqrt(vx.cast("double")) * sqrt(vy.cast("double"))))
        .as("assortativity"))
  }

  /** BLOCKING QUALITY AUDIT — the two numbers that price any blocking
    * scheme (here: the LSH bands) before a dedup run commits to it:
    * REDUCTION RATIO (how much of the n(n−1)/2 all-pairs space the
    * blocks discard) and PAIRS COMPLETENESS (what share of true
    * duplicate pairs the blocks still cover). Ground truth is exact:
    * the doubled-crawl corpus (q50's convention) guarantees every doc a
    * byte-identical twin, so truth pairs come from one md5 groupBy —
    * never an all-pairs scan — and PC measures something real: an
    * identical twin can still be LOST to the per-bucket membership cap,
    * which is exactly the failure mode this audit exists to price. All
    * ratios exact ppm; the n(n−1)/2 denominator runs in DECIMAL(38,0)/
    * HUGEINT (n² passes int64 around 4 billion docs).
    */
  val q237BlockingQuality = Q.checked(
    "q237_blocking_quality",
    s"""WITH $duckCrawlCte, ${duckCandCtes.replace("FROM documents", "FROM crawl")},
       |h AS (SELECT md5(text) AS h, doc_id FROM crawl),
       |truth AS (
       |  SELECT x.doc_id AS a, y.doc_id AS b
       |  FROM h x JOIN h y ON y.h = x.h AND x.doc_id < y.doc_id),
       |f AS (SELECT count(*) AS n_found FROM truth JOIN cand USING (a, b)),
       |c AS (SELECT count(*) AS n_cand FROM cand),
       |t AS (SELECT count(*) AS n_truth FROM truth),
       |n AS (SELECT CAST(count(*) AS HUGEINT) AS n_docs FROM crawl)
       |SELECT CAST(n.n_docs AS BIGINT) AS n_docs, c.n_cand, t.n_truth, f.n_found,
       |  f.n_found * 1000000 // t.n_truth AS pc_ppm,
       |  CAST(1000000 - CAST(c.n_cand AS HUGEINT) * 1000000
       |       // (n.n_docs * (n.n_docs - 1) // 2) AS BIGINT) AS rr_ppm
       |FROM n CROSS JOIN c CROSS JOIN t CROSS JOIN f""") { (s, dir) =>
    val docs = crawl(table(s, dir, "documents")).localCheckpoint(true)
    val cand = Dedup.candidatePairs(autoBands(docs), BucketCap)
      .localCheckpoint(true) // feeds the count and the truth intersection
    val h = docs.select(md5(col("text")).as("h"), col("doc_id"))
    val truth = h.alias("x")
      .join(h.alias("y"),
        col("y.h") === col("x.h") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .localCheckpoint(true)
    val f = truth.join(cand, Seq("a", "b")).agg(count(lit(1)).as("n_found"))
    val c = cand.agg(count(lit(1)).as("n_cand"))
    val t = truth.agg(count(lit(1)).as("n_truth"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    n.crossJoin(broadcast(c)).crossJoin(broadcast(t)).crossJoin(broadcast(f))
      .select(col("n_docs"), col("n_cand"), col("n_truth"), col("n_found"),
        expr("n_found * 1000000 DIV n_truth").as("pc_ppm"),
        expr("CAST(1000000 - CAST(n_cand AS DECIMAL(38,0)) * 1000000" +
          " DIV (CAST(n_docs AS DECIMAL(38,0)) * (n_docs - 1) DIV 2) AS BIGINT)")
          .as("rr_ppm"))
  }

  /** DEDUP SAVINGS REPORT — the number a storage/training-budget owner
    * actually asks for after a dedup pass: per language, how many
    * documents and how many BYTES the exact-dedup keep-one policy
    * drops, and the savings share in exact ppm. Runs over the doubled
    * crawl (q50's corpus), attributes each dropped doc to ITS language slice
    * (identical text can cross slices; the group key is the text hash
    * alone), and the keeper is q50's min-doc_id convention — so this
    * report is definitionally consistent with the q50/q59 dedup family.
    * One text-hash groupBy, one hash-keyed join back, language-scale out.
    */
  val q241DedupSavings = Q.checked(
    "q241_dedup_savings",
    s"""WITH $duckCrawlCte,
       |d AS (SELECT doc_id, lang, n_chars, md5(text) AS h FROM crawl),
       |k AS (SELECT h, min(doc_id) AS keeper FROM d GROUP BY h)
       |SELECT d.lang, count(*) AS n_docs,
       |  CAST(sum(CASE WHEN d.doc_id <> k.keeper THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       |  CAST(sum(d.n_chars) AS BIGINT) AS chars_total,
       |  CAST(sum(CASE WHEN d.doc_id <> k.keeper THEN d.n_chars ELSE 0 END) AS BIGINT) AS chars_dropped,
       |  CAST(sum(CASE WHEN d.doc_id <> k.keeper THEN d.n_chars ELSE 0 END) AS BIGINT)
       |    * 1000000 // CAST(sum(d.n_chars) AS BIGINT) AS savings_ppm
       |FROM d JOIN k USING (h)
       |GROUP BY d.lang""") { (s, dir) =>
    val d = crawl(table(s, dir, "documents"))
      .select(col("doc_id"), col("lang"), col("n_chars"), md5(col("text")).as("h"))
    val k = d.groupBy(col("h")).agg(min(col("doc_id")).as("keeper"))
    val dropped = when(col("doc_id") =!= col("keeper"), col("n_chars")).otherwise(0L)
    d.join(k, "h")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("doc_id") =!= col("keeper"), 1L).otherwise(0L)).cast("long")
          .as("n_dropped"),
        sum(col("n_chars")).cast("long").as("chars_total"),
        sum(dropped).cast("long").as("chars_dropped"))
      .select(col("lang"), col("n_docs"), col("n_dropped"), col("chars_total"),
        col("chars_dropped"),
        expr("chars_dropped * 1000000 DIV chars_total").as("savings_ppm"))
  }

  val all: Vector[Q] =
    Vector(q50DedupExact, q51MinhashLsh, q52Simhash, q53Jaccard,
      q57EmbedDedup, q58DedupGroups, q59DedupApply, q87Triangles,
      q97BinaryDedup, q103SnapshotDiff, q106UrlDedup, q110IncrementalDedup,
      q115ParagraphDedup, q127Pagerank, q128SetsimJoin, q128bSetsimCliques,
      q133MergeUpsert,
      q142LabelProp, q144SourceOverlap, q155IvmAgg, q158BestKeeper,
      q160BfsDist, q166EntityResolution, q168Kcore, q170TimeTravel,
      q175GoldenRecord, q182KanonAudit, q183IncrementalCc, q183bCcStreaming,
      q183cCcRetire, q183dCcStaleness, q183eCcReindex, q183fCcMaintain,
      q188WeightedSssp,
      q193NormalizedDedup, q194ContainmentJoin, q194bContainmentNarrow,
      q196PersonalizedPagerank,
      q198LshDecontaminate, q209DegreeDist, q226MinhashCalibration,
      q228Assortativity, q237BlockingQuality, q241DedupSavings)
}

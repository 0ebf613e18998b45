package graft.core

import org.apache.spark.sql.{Dataset, Encoder, Encoders, KeyValueGroupedDataset, SparkSession}
import org.apache.spark.sql.functions.col
import scala.reflect.ClassTag

/** Typed relation: the engine's user-facing operator surface.
  *
  * A `Flow[T]` is an unordered bag of `T` (the reference's relation — "there
  * is no defined order", pigpen-core/src/main/clojure/pigpen/map.clj:68-70)
  * backed by a Spark `Dataset[T]`. Operators mirror the reference DSL
  * (pigpen-core/src/main/clojure/pigpen/core.clj:39-94) but compile to
  * declarative Dataset transformations, so Catalyst handles fusion,
  * pushdown, pruning, and partial aggregation — the work the reference's
  * "oven" did by hand (SURVEY.md §4.1).
  *
  * Two lanes, mirroring the reference's `:field-type` discipline
  * (SURVEY.md §1.2): keys and storage columns stay native (typed columns →
  * full Catalyst + Tungsten); arbitrary user values ride product/kryo
  * encoders. Key type-class bounds (`Encoder`) enforce the reference's
  * "sort/shuffle keys must be platform-comparable" rule at compile time.
  */
final case class Flow[T](ds: Dataset[T]) {
  private implicit def tEnc: Encoder[T] = ds.encoder
  private implicit def tTag: ClassTag[T] = ClassTag.AnyRef.asInstanceOf[ClassTag[T]]
  def spark: SparkSession = ds.sparkSession

  // ---- map family (reference pigpen/map.clj, SURVEY.md §2.3) ----

  /** 1→1 user fn (reference map.clj:59-77). Chains of map/filter/mapcat
    * stay one narrow Spark stage — the bind-fusion rewrite
    * (oven.clj:189-248) is free here.
    */
  def map[U: Encoder](f: T => U): Flow[U] = Flow(ds.map(f))

  /** 1→N (reference `mapcat`, map.clj:99-111). */
  def mapcat[U: Encoder](f: T => IterableOnce[U]): Flow[U] = Flow(ds.flatMap(f))

  /** Partition-at-a-time escape hatch (the reference's fused `bind$`). */
  def mapPartitions[U: Encoder](f: Iterator[T] => Iterator[U]): Flow[U] =
    Flow(ds.mapPartitions(f))

  def filter(p: T => Boolean): Flow[T] = Flow(ds.filter(p))

  /** reference pigpen/filter.clj:67-80. */
  def remove(p: T => Boolean): Flow[T] = Flow(ds.filter((t: T) => !p(t)))

  def take(n: Int): Flow[T] = Flow(ds.limit(n))

  /** Bernoulli sample, non-deterministic (reference filter.clj:97-112). */
  def sample(p: Double): Flow[T] = Flow(ds.sample(withReplacement = false, p))

  /** Deterministic hash-Bernoulli sample: keeps rows whose 31-bit LCG mix
    * of `key` falls under `p`. The reference's sample is true-random; at
    * corpus scale a REPRODUCIBLE sample (same rows every run, plain
    * integer arithmetic any engine can replay) is usually what a pipeline
    * wants — this is the deterministic companion to [[sample]].
    *
    * The key is xor-folded (`k ^ (k >>> 31)`) before the LCG: the LCG's
    * final `mod 2^31` is blind to input bits ≥31, so without the fold two
    * 64-bit keys sharing their low 31 bits (e.g. `shard << 32 | seq` ids)
    * would always get the same keep/drop decision.
    */
  def sampleBy(p: Double)(key: T => Long): Flow[T] = {
    require(p >= 0.0 && p <= 1.0, "p must be in [0, 1]")
    val threshold = (p * 2147483648.0).toLong
    Flow(ds.filter((t: T) => Flow.lcg31(key(t)) < threshold))
  }

  /** Deterministic WEIGHTED sample: keep each row with probability
    * `weight(t)` (clamped to [0,1]) — quality-weighted corpus
    * construction, reproducible like [[sampleBy]]: the decision is the
    * key's LCG hash against a per-row integer threshold.
    */
  def sampleWeighted(weight: T => Double)(key: T => Long): Flow[T] =
    Flow(ds.filter { (t: T) =>
      val w = math.min(math.max(weight(t), 0.0), 1.0)
      Flow.lcg31(key(t)) < math.round(w * 2147483648.0)
    })

  /** Deterministic FIXED-SIZE sample: exactly `n` rows (or all, if fewer),
    * chosen as the lowest-hash keys — "give me exactly N docs,
    * reproducibly". The limit sits directly on the sort, so Spark plans a
    * TakeOrderedAndProject: every partition keeps an n-row bounded heap
    * and the driver merges n-row partials — never a full global sort.
    * Hash ties break on the raw key, so the sample is unique when keys
    * are.
    */
  def sampleFixed(n: Int)(key: T => Long): Flow[T] = {
    require(n >= 0, "n must be non-negative")
    val keyed = ds.map((t: T) => (Flow.lcg31(key(t)), key(t), t))(
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, tEnc))
    Flow(keyed.orderBy(col("_1").asc, col("_2").asc).limit(n).map(_._3))
  }

  // ---- sort / rank (reference map.clj:164-250, raw.clj:340-371) ----

  /** Total sort by a native-comparable key; the key column is dropped from
    * the output like the reference's `sort$` (raw.clj:355). Distributed
    * range-partitioned sort — no single reducer.
    */
  def sortBy[K: Encoder](key: T => K, asc: Boolean = true): Flow[T] = {
    val keyed = ds.map((t: T) => (key(t), t))(Encoders.tuple(implicitly[Encoder[K]], tEnc))
    val sorted = keyed.orderBy(if (asc) col("_1").asc else col("_1").desc)
    Flow(sorted.map(_._2))
  }

  /** Prepend a global 0-based index (reference `map-indexed`/`rank$`,
    * map.clj:135-162). Uses RDD `zipWithIndex`: two jobs (one to count
    * partition sizes) but fully distributed — never the single reducer of
    * the reference's Cascading RankBuffer (SURVEY.md §2.7). The index is
    * only deterministic after `sortBy`.
    */
  def mapIndexed[U: Encoder](f: (Long, T) => U): Flow[U] = {
    val indexed = ds.rdd.zipWithIndex().map { case (t, i) => f(i, t) }(
      ClassTag.AnyRef.asInstanceOf[ClassTag[U]])
    Flow(spark.createDataset(indexed))
  }

  /** `sort |> rank` fused (the reference's merge-sort-rank rewrite,
    * pigpen-pig/src/main/clojure/pigpen/pig/oven.clj:75-110).
    */
  def rankBy[K: Encoder](key: T => K, asc: Boolean = true): Flow[(Long, T)] = {
    implicit val pair: Encoder[(Long, T)] = Encoders.tuple(Encoders.scalaLong, tEnc)
    sortBy(key, asc).mapIndexed((i, t) => (i, t))
  }

  /** Pig RANK semantics (reference rank$, SURVEY.md §2.7): equal keys share
    * an index; `dense = true` makes indexes sequential (DENSE_RANK), else
    * ties skip (RANK). 0-based like the reference's dec-rank rewrite.
    *
    * Scale design: no global-window single reducer. Ranks come from a
    * distributed prefix-scan over the (small) distinct-key table — count
    * per key, range-partitioned sort, per-partition offsets collected to
    * the driver (one pair per partition, like zipWithIndex) — then a hash
    * join back onto the data.
    */
  def rankTiesBy[K: Encoder](key: T => K, dense: Boolean = false): Flow[(Long, T)] = {
    val kEnc: Encoder[K] = implicitly[Encoder[K]]
    implicit val kt: Encoder[(K, T)] = Encoders.tuple(kEnc, tEnc)
    implicit val kl: Encoder[(K, Long)] = Encoders.tuple(kEnc, Encoders.scalaLong)
    val keyed = ds.map((t: T) => (key(t), t))
    val counts = keyed.groupByKey(_._1).count().orderBy(col("key"))
    val rdd = counts.rdd
    // per-partition (numKeys, numRows) — tiny: one pair per partition
    val partTotals = rdd
      .mapPartitionsWithIndex { (i, it) =>
        var keys = 0L; var rows = 0L
        it.foreach { kv => keys += 1; rows += kv._2 }
        Iterator((i, keys, rows))
      }.collect().sortBy(_._1)
    val keyOffsets = partTotals.scanLeft(0L)(_ + _._2).init
    val rowOffsets = partTotals.scanLeft(0L)(_ + _._3).init
    val rankOfKey = rdd.mapPartitionsWithIndex { (i, it) =>
      var denseIdx = keyOffsets(i)
      var rowIdx = rowOffsets(i)
      it.map { case (k, c) =>
        val r = if (dense) denseIdx else rowIdx
        denseIdx += 1; rowIdx += c
        (k, r)
      }
    }
    val rankDs = spark.createDataset(rankOfKey).alias("__gr")
    val l = keyed.alias("__gl")
    implicit val out: Encoder[(Long, T)] = Encoders.tuple(Encoders.scalaLong, tEnc)
    Flow(l.joinWith(rankDs, col("__gl._1") === col("__gr._1"), "inner")
      .map(p => (p._2._2, p._1._2)))
  }

  /** Distinct with an explicit partitioner (the reference's `:partition-by`
    * opt on distinct, PigPenPartitioner — SURVEY.md §2.9). Values are
    * co-located by the custom function with EXACT placement (partition
    * index = fn(value) mod n, which is the point of the op), then
    * de-duplicated per partition with BOUNDED memory: the shuffle sorts
    * within each partition by element hash (Spark's external sorter —
    * spills to disk), so equal elements arrive adjacent and the scan only
    * buffers one equal-hash run at a time. Identity hash codes are fine:
    * sort and scan run in the same task, so within-task consistency is
    * all the dedup needs. Prefer plain [[distinct]] (hash aggregate)
    * unless partition placement itself is the point.
    */
  def distinctPartitionBy(partitions: Int)(partitionKey: T => Int): Flow[T] = {
    val part = new org.apache.spark.Partitioner {
      override def numPartitions: Int = partitions
      override def getPartition(key: Any): Int = {
        val h = key.asInstanceOf[(Int, Int)]._1 % partitions
        if (h < 0) h + partitions else h
      }
    }
    val r = ds.rdd.map(t => ((partitionKey(t), t.hashCode), t))
      .repartitionAndSortWithinPartitions(part)
      .mapPartitions { it =>
        var runHash = 0
        var runSeen = List.empty[T] // one equal-hashCode run, usually size 1
        it.flatMap { case ((_, h), t) =>
          if (runSeen.isEmpty || h != runHash) { runHash = h; runSeen = List(t); Iterator.single(t) }
          else if (runSeen.contains(t)) Iterator.empty
          else { runSeen ::= t; Iterator.single(t) }
        }
      }
    Flow(spark.createDataset(r))
  }

  /** Cross product of two flattened projections (reference: multiple
    * `:flatten` projections in one `project$` multiply out,
    * raw.clj:262-265, local.clj:299-306). One `flatMap` computing the
    * product per row — no join, no shuffle.
    */
  def flattenProduct[A, B](f: T => (IterableOnce[A], IterableOnce[B]))(
      implicit e: Encoder[(A, B)]): Flow[(A, B)] =
    Flow(ds.flatMap { t =>
      val (as, bs) = f(t)
      val bSeq = bs.iterator.toSeq
      as.iterator.flatMap(a => bSeq.map(b => (a, b)))
    })

  /** reference `debug` (runtime.clj:174-178): value → "Type\tvalue" line. */
  def debugString(implicit e: Encoder[String]): Flow[String] =
    map(t => s"${t.getClass.getSimpleName}\t$t")

  // ---- set ops (reference pigpen/set.clj, SURVEY.md §2.6) ----

  /** Bag concat, no dedup, N-ary (reference set.clj:155-197). */
  def concat(others: Flow[T]*): Flow[T] =
    Flow(others.foldLeft(ds)((a, b) => a.union(b.ds)))

  def distinct: Flow[T] = Flow(ds.distinct())

  /** concat + distinct (reference set.clj:127-153). */
  def union(others: Flow[T]*): Flow[T] = concat(others: _*).distinct

  /** Multiset union = bag concat, duplicates kept (reference
    * `union-multiset`, set.clj:155-175 — same relation as [[concat]],
    * aliased for API parity).
    */
  def unionMultiset(others: Flow[T]*): Flow[T] = concat(others: _*)

  /** Distinct ∩ (reference set.clj:199-221). */
  def intersection(others: Flow[T]*): Flow[T] =
    Flow(others.foldLeft(ds)((a, b) => a.intersect(b.ds)))

  /** Min-multiplicity ∩ (reference set.clj:223-245). */
  def intersectionMultiset(others: Flow[T]*): Flow[T] =
    Flow(others.foldLeft(ds)((a, b) => a.intersectAll(b.ds)))

  /** Distinct minus (reference set.clj:247-269). */
  def difference(others: Flow[T]*): Flow[T] =
    Flow(others.foldLeft(ds)((a, b) => a.except(b.ds)))

  /** Multiplicity-subtracting minus (reference set.clj:271-293). */
  def differenceMultiset(others: Flow[T]*): Flow[T] =
    Flow(others.foldLeft(ds)((a, b) => a.exceptAll(b.ds)))

  // ---- grouping (reference pigpen/join.clj:195-223) ----

  /** Group by a derived key. Keys must be native-comparable (`Encoder`
    * bound) so Spark can hash-partition them — the reference's
    * `native-key-frozen-val` rule enforced by types.
    */
  def groupBy[K: Encoder](key: T => K): GroupedFlow[K, T] =
    new GroupedFlow(ds.groupByKey(key))

  /** Skew-resistant per-key fold: two-phase aggregation through a salted
    * key. Phase 1 folds on (key, hash(row) % salts) — a pathological hot
    * key's rows spread over `salts` reducers; phase 2 merges the ≤`salts`
    * partial buffers per key and finishes. Algebraically identical to
    * `groupBy(key).fold(f)` for any [[Fold]] (associative merge); use when
    * one key holds a data-scale fraction of the input and AQE's skew
    * handling isn't available for the aggregation.
    */
  def groupBySaltedFold[K: Encoder, B, C: Encoder](key: T => K, salts: Int)(
      f: Fold[T, B, C]): Flow[(K, C)] = {
    require(salts > 0, "salts must be positive")
    val kEnc = implicitly[Encoder[K]]
    implicit val bEnc: Encoder[B] =
      Encoders.kryo[B](ClassTag.AnyRef.asInstanceOf[ClassTag[B]])
    implicit val saltedKey: Encoder[(K, Int)] = Encoders.tuple(kEnc, Encoders.scalaInt)
    implicit val partialRow: Encoder[((K, Int), B)] = Encoders.tuple(saltedKey, bEnc)
    implicit val out: Encoder[(K, C)] = Encoders.tuple(kEnc, implicitly[Encoder[C]])
    val phase1 = ds
      .groupByKey { (t: T) =>
        val s = t.hashCode() % salts
        (key(t), if (s < 0) s + salts else s)
      }
      .agg(Fold(f.zero, f.reduce, f.merge, identity[B]).toColumn)
    Flow(phase1
      .groupByKey((p: ((K, Int), B)) => p._1._1)(kEnc)
      .mapGroups { (k: K, it: Iterator[((K, Int), B)]) =>
        (k, f.finish(it.map(_._2).reduce(f.merge)))
      })
  }

  // ---- joins (reference pigpen/join.clj:316-483, SURVEY.md §2.4) ----

  /** Typed equi-join. Outer shapes surface misses as `None`, mirroring the
    * reference's outer-join nils. Default key matching is SQL semantics —
    * null keys never match (join.clj:31-45); `joinNils = true` switches to
    * null-safe `<=>` (the reference's `{:join-nils true}`). Use `Option[K]`
    * keys to express nullable keys in the typed lane.
    *
    * Executes as a standard Spark shuffled/broadcast hash join on the
    * extracted key column; wrap the small side with [[Flow.broadcastHint]]
    * or rely on AQE at scale.
    */
  def joinWith[U, K: Encoder](other: Flow[U], kind: JoinKind = JoinKind.Inner, joinNils: Boolean = false)(
      lk: T => K)(rk: U => K)(
      implicit outEnc: Encoder[(Option[T], Option[U])]): Flow[(Option[T], Option[U])] = {
    val uEnc: Encoder[U] = other.ds.encoder
    val l = ds.map((t: T) => (lk(t), t))(Encoders.tuple(implicitly[Encoder[K]], tEnc)).alias("__gl")
    val r = other.ds.map((u: U) => (rk(u), u))(Encoders.tuple(implicitly[Encoder[K]], uEnc)).alias("__gr")
    val cond =
      if (joinNils) col("__gl._1") <=> col("__gr._1")
      else col("__gl._1") === col("__gr._1")
    val joined = l.joinWith(r, cond, kind.sql)
    Flow(joined.map { p =>
      (Option(p._1).map(_._2), Option(p._2).map(_._2))
    })
  }

  /** Inner join convenience: f over each row of the per-key cross product
    * (reference join.clj:360-401). N-way joins chain pairwise (the
    * reference requires N>2 joins to be all-required, raw.clj:555-557,
    * which is exactly a chain of inner joins).
    */
  def join[U, K: Encoder, R: Encoder](other: Flow[U])(lk: T => K)(rk: U => K)(f: (T, U) => R)(
      implicit outEnc: Encoder[(Option[T], Option[U])]): Flow[R] =
    joinWith(other, JoinKind.Inner)(lk)(rk).map { p => f(p._1.get, p._2.get) }

  /** Semi-join that PRESERVES duplicates in `keys` (reference `filter-by`,
    * join.clj:403-441): each occurrence of a key duplicates the matching
    * row, so this is an inner join against the keys relation — NOT
    * `left_semi` (reference functional/join_test.clj:655-667). Null keys
    * pass iff null ∈ keys: null-safe `<=>` matching.
    */
  def filterBy[K: Encoder](keys: Flow[K])(key: T => K): Flow[T] = {
    val kEnc = implicitly[Encoder[K]]
    val l = ds.map((t: T) => (key(t), t))(Encoders.tuple(kEnc, tEnc)).alias("__gl")
    val r = keys.ds.map((k: K) => (k, 1))(Encoders.tuple(kEnc, Encoders.scalaInt)).alias("__gr")
    Flow(l.joinWith(r, col("__gl._1") <=> col("__gr._1"), "inner").map(_._1._2))
  }

  /** Anti-join (reference `remove-by`, join.clj:443-483): keep rows whose
    * key is absent from `keys`; null-key rows are kept unless null ∈ keys
    * (sentinel-nil semantics) — hence null-safe matching. Keys are
    * de-duplicated first, so multiplicity in `keys` is irrelevant (matches
    * the reference: anti-join output multiplicity comes from the left only).
    */
  def removeBy[K: Encoder](keys: Flow[K])(key: T => K): Flow[T] = {
    val kEnc = implicitly[Encoder[K]]
    val l = ds.map((t: T) => (key(t), t))(Encoders.tuple(kEnc, tEnc)).alias("__gl")
    val r = keys.ds.map((k: K) => (k, 1))(Encoders.tuple(kEnc, Encoders.scalaInt)).distinct().alias("__gr")
    val joined = l.joinWith(r, col("__gl._1") <=> col("__gr._1"), "left_outer")
    Flow(joined.filter(p => p._2 == null).map(_._1._2))
  }

  /** 2-way cogroup (reference join.clj:316-358). The per-key bags arrive as
    * Iterators — groups stream and are never required to fit in memory at
    * once (the reference's Accumulator discipline, SURVEY.md §2.9). N-way
    * cogroup goes through [[cogroup3]] (tagged union, one shuffle).
    */
  def cogroup[U, K: Encoder, R: Encoder](other: Flow[U])(lk: T => K)(rk: U => K)(
      f: (K, Iterator[T], Iterator[U]) => IterableOnce[R]): Flow[R] = {
    Flow(ds.groupByKey(lk).cogroup(other.ds.groupByKey(rk))((k, l, r) => f(k, l, r).iterator))
  }

  /** 2-way cogroup with the reference's full option matrix
    * (join.clj:316-358 + functional/join_test.clj:244-359): per-input
    * `required` flags (a row is dropped when a required input's bag is
    * empty — the inner/left/right/full shapes) and `joinNils`. By default
    * nil keys from DIFFERENT inputs do not meet — each side's nil bag
    * surfaces as its own row, exactly Pig's COGROUP; `joinNils = true`
    * groups them into one row. One tagged union + one hash shuffle
    * regardless of options; `f` sees materialized bags (empty Seq is the
    * reference's nil bag). Nil keys are `null` or `None`.
    */
  def cogroupWith[U, K: Encoder, R: Encoder](other: Flow[U],
      leftRequired: Boolean = false, rightRequired: Boolean = false,
      joinNils: Boolean = false)(lk: T => K)(rk: U => K)(
      f: (K, Seq[T], Seq[U]) => IterableOnce[R]): Flow[R] = {
    val kEnc = implicitly[Encoder[K]]
    implicit val tagged: Encoder[(K, Int, Any)] =
      Encoders.tuple(kEnc, Encoders.scalaInt, Encoders.kryo[Any])
    implicit val groupKey: Encoder[(K, Int)] = Encoders.tuple(kEnc, Encoders.scalaInt)
    val l = ds.map((t: T) => (lk(t), 1, t: Any))
    val r = other.ds.map((u: U) => (rk(u), 2, u: Any))
    // nil keys get a per-side salt unless joinNils, so the two sides' nil
    // bags land in different groups (Pig: nils group within a relation,
    // never across relations)
    def isNil(k: K): Boolean = k == null || k == None
    Flow(l.union(r)
      .groupByKey((x: (K, Int, Any)) => (x._1, if (!joinNils && isNil(x._1)) x._2 else 0))
      .flatMapGroups { (key: (K, Int), it: Iterator[(K, Int, Any)]) =>
        val lb = Vector.newBuilder[T]
        val rb = Vector.newBuilder[U]
        it.foreach { x =>
          if (x._2 == 1) lb += x._3.asInstanceOf[T] else rb += x._3.asInstanceOf[U]
        }
        val ls = lb.result(); val rs = rb.result()
        if ((leftRequired && ls.isEmpty) || (rightRequired && rs.isEmpty)) Iterator.empty
        else f(key._1, ls, rs).iterator
      })
  }

  /** Cogroup with per-input folds (the reference's `:fold` select option,
    * join.clj:63-66, 102-117 — the Algebraic-UDF / PigPenAggregateBy path):
    * each input is reduced to one fold result per key BEFORE the join, so
    * only (key, buffer) pairs shuffle — the map-side-combine shape for
    * joining two aggregations. Outer semantics: a key present in only one
    * input surfaces the other side as None.
    */
  def cogroupFold[U, K: Encoder, B1, C1, B2, C2](other: Flow[U])(
      lk: T => K)(rk: U => K)(f1: Fold[T, B1, C1], f2: Fold[U, B2, C2])(
      implicit c1Enc: Encoder[C1], c2Enc: Encoder[C2],
      outEnc: Encoder[(K, Option[C1], Option[C2])]): Flow[(K, Option[C1], Option[C2])] = {
    val kEnc = implicitly[Encoder[K]]
    implicit val kc1: Encoder[(K, C1)] = Encoders.tuple(kEnc, c1Enc)
    implicit val kc2: Encoder[(K, C2)] = Encoders.tuple(kEnc, c2Enc)
    val l = ds.groupByKey(lk).agg(f1.toColumn)
    val r = other.ds.groupByKey(rk).agg(f2.toColumn)
    Flow(l.joinWith(r, l("key") === r("key"), "full_outer").map { p =>
      val k = if (p._1 != null) p._1._1 else p._2._1
      (k, Option(p._1).map(_._2), Option(p._2).map(_._2))
    })
  }

  /** 3-way cogroup (reference group$ is N-ary, model.clj:167-172; Pig
    * COGROUP takes any number of inputs in ONE shuffle). Implemented the
    * same way Pig does: tag each input, union, one `groupByKey` — a single
    * hash shuffle regardless of arity, instead of chaining 2-way cogroups
    * (which would shuffle the growing intermediate N-1 times). Values cross
    * the shuffle on the kryo lane (the reference's frozen values); keys stay
    * native so partitioning/compare is columnar.
    *
    * Per-key bags are materialized (the user fn sees Seqs) — same contract
    * as the reference's N-way group; use per-input [[Fold]]s upstream when
    * bags would be unbounded at scale. Typed facade over [[Flow.cogroupN]].
    */
  def cogroup3[U, V, K: Encoder, R: Encoder](o1: Flow[U], o2: Flow[V])(
      kt: T => K)(ku: U => K)(kv: V => K)(
      f: (K, Seq[T], Seq[U], Seq[V]) => IterableOnce[R]): Flow[R] =
    Flow.cogroupN[K, R](Seq(
        Flow.in(this)(kt), Flow.in(o1)(ku), Flow.in(o2)(kv))) { (k, bags) =>
      f(k, bags(0).asInstanceOf[Seq[T]], bags(1).asInstanceOf[Seq[U]],
        bags(2).asInstanceOf[Seq[V]])
    }

  // ---- whole-relation collapse (reference join.clj:225-314) ----

  /** Parallel tree aggregation over the whole relation; empty input ⇒ empty
    * output, never a zero row (reference join.clj:296-302 + SURVEY.md
    * §7.4.2). Distributed: per-partition partials merged in one final task —
    * the safe replacement for the reference's single-reducer `reduce`/`into`
    * at 100 TB (only pre-aggregated partials, one per partition, ever meet).
    */
  def foldAll[B, C: Encoder](fold: Fold[T, B, C]): Flow[C] = {
    implicit val bTag: ClassTag[B] = ClassTag.AnyRef.asInstanceOf[ClassTag[B]]
    implicit val cTag: ClassTag[C] = ClassTag.AnyRef.asInstanceOf[ClassTag[C]]
    val partials = ds.rdd.mapPartitions { it =>
      if (it.isEmpty) Iterator.empty else Iterator(it.foldLeft(fold.zero())(fold.reduce))
    }
    val one = partials.coalesce(1).mapPartitions { it =>
      if (it.isEmpty) Iterator.empty else Iterator(fold.finish(it.reduce(fold.merge)))
    }
    Flow(spark.createDataset(one))
  }

  /** Whole-relation reduce with associative `f` (reference join.clj:247-278
    * ran one sequential reducer; we tree-reduce — same result for the
    * associative functions the reference's own fold library uses).
    * Empty input ⇒ empty output.
    */
  def reduce(f: (T, T) => T): Flow[T] = {
    val partials = ds.rdd.mapPartitions(it => if (it.isEmpty) Iterator.empty else Iterator(it.reduce(f)))
    val one = partials.coalesce(1).mapPartitions(it => if (it.isEmpty) Iterator.empty else Iterator(it.reduce(f)))
    Flow(spark.createDataset(one))
  }

  /** Pour the whole relation into one collection (reference `into`,
    * join.clj:225-244). Single-record output; same unbounded-result hazard
    * as the reference — prefer `foldAll` with a bounded fold.
    */
  def intoSeq(implicit e: Encoder[Vector[T]]): Flow[Vector[T]] =
    foldAll(Fold.vec[T])

  // ---- plumbing ----

  /** Mark this side broadcastable for subsequent joins (the reference's
    * `{:strategy :replicated}`, pig/script.clj:295-299).
    */
  def broadcastHint: Flow[T] = Flow(org.apache.spark.sql.functions.broadcast(ds))

  /** Explicit DOP control (the reference's `:parallel n` opt). */
  def parallel(n: Int): Flow[T] = Flow(ds.repartition(n))

  def persist(): Flow[T] = Flow(ds.persist())
  def toDF: org.apache.spark.sql.DataFrame = ds.toDF()

  /** Execute and collect (the reference's `pigpen.core/dump`). */
  def dump(): Seq[T] = ds.collect().toSeq
}

object Flow {
  /** Inline constant relation (reference `pig/return`, io.clj:265-300). */
  def of[T: Encoder](spark: SparkSession)(data: Seq[T]): Flow[T] =
    Flow(spark.createDataset(data))

  /** Shared sampling hash: xor-fold the 64-bit key (the final mod-2^31 is
    * blind to bits ≥31, see [[Flow.sampleBy]]) then a 31-bit LCG — plain
    * integer arithmetic any engine (and any oracle) can replay.
    *
    * The fold is masked to 31 bits BEFORE the multiply so the product
    * stays ≤ (2^31−1)·1103515245 < 2^62 — without the mask, ids ≥ ~2^33
    * overflow the multiply (silent wraparound here; an ANSI-mode ERROR in
    * the Column twins — the x16 probe corpus, whose ids carry 10^9-scale
    * copy offsets, caught exactly that in q_mixture). For ids < 2^31 the
    * mask is a no-op, so every existing oracle replays unchanged.
    */
  private[graft] def lcg31(k: Long): Long = {
    val folded = (k ^ (k >>> 31)) & 0x7fffffffL
    (folded * 1103515245L + 12345L) & 0x7fffffffL
  }

  /** One input of an N-way [[cogroupN]]: a relation plus its key fn, with
    * the element type erased (the reference's group$ is dynamically typed
    * too — bags of arbitrary values). Build via [[in]].
    */
  final case class CogroupInput[K](ds: Dataset[_], key: Any => K)

  def in[T, K](fl: Flow[T])(k: T => K): CogroupInput[K] =
    CogroupInput(fl.ds, k.asInstanceOf[Any => K])

  /** N-way cogroup for ANY arity (reference group$ is N-ary,
    * model.clj:167-172; Pig COGROUP takes any number of inputs in ONE
    * shuffle). Same plan shape as [[Flow.cogroup3]]: tag each input, union,
    * one `groupByKey` — a single hash shuffle regardless of arity, instead
    * of chaining 2-way cogroups (which would shuffle the growing
    * intermediate N-1 times). Keys stay native (columnar partition/compare);
    * values cross the shuffle on the kryo lane.
    *
    * `f` sees one bag per input, index-aligned with `inputs`; keys present
    * in any input appear with empty bags for the rest. Dynamically typed
    * like the reference — use [[Flow.cogroup]]/[[Flow.cogroup3]] when a
    * fixed arity should keep static types.
    */
  def cogroupN[K: Encoder, R: Encoder](inputs: Seq[CogroupInput[K]])(
      f: (K, IndexedSeq[Seq[Any]]) => IterableOnce[R]): Flow[R] = {
    require(inputs.nonEmpty, "cogroupN needs at least one input")
    val n = inputs.size
    val kEnc = implicitly[Encoder[K]]
    implicit val tagged: Encoder[(K, Int, Any)] =
      Encoders.tuple(kEnc, Encoders.scalaInt, Encoders.kryo[Any])
    val unioned = inputs.zipWithIndex.map { case (in, i) =>
      in.ds.asInstanceOf[Dataset[Any]].map((t: Any) => (in.key(t), i, t))
    }.reduce(_ union _)
    Flow(unioned.groupByKey(_._1).flatMapGroups { (k: K, it: Iterator[(K, Int, Any)]) =>
      val bags = IndexedSeq.fill(n)(Vector.newBuilder[Any])
      it.foreach { case (_, i, x) => bags(i) += x }
      f(k, bags.map(_.result())).iterator
    })
  }

  /** One input of an N-way [[cogroupNFold]]: relation + key fn + the fold
    * that reduces it, types erased like [[CogroupInput]]. Build via
    * [[inFold]].
    */
  final case class CogroupFoldInput[K](ds: Dataset[_], key: Any => K,
      fold: Fold[Any, Any, Any])

  def inFold[T, K, B, C](fl: Flow[T])(k: T => K)(f: Fold[T, B, C]): CogroupFoldInput[K] =
    CogroupFoldInput(fl.ds, k.asInstanceOf[Any => K],
      f.asInstanceOf[Fold[Any, Any, Any]])

  /** Per-group state of [[cogroupNFold]]: one buffer per input, plus seen
    * flags so a key absent from an input surfaces as None (not a fold of
    * zero rows). Kryo lane, like every fold buffer.
    */
  final case class MultiFoldBuf(bufs: Array[Any], seen: Array[Boolean])

  /** N-way cogroup where EVERY input is reduced by its own [[Fold]] — the
    * reference's `:fold` option on any select of a group
    * (pigpen-core/src/main/clojure/pigpen/join.clj:63-66, 102-117, the
    * Algebraic-UDF path), generalized past [[Flow.cogroupFold]]'s 2-way
    * shape. Same single tagged-union hash shuffle as [[cogroupN]], but the
    * per-key state is the N fold BUFFERS — combined map-side by the
    * partial aggregate — so an N-way grouped aggregation never
    * materializes a bag: what crosses the shuffle per (key, partition) is
    * one buffer array, regardless of how many rows the key has. This is
    * the shape N-way grouped aggregation must have at 100 TB; a
    * bag-shaped select is just `Fold.vec`, so mixed bag/fold groups
    * compose here too (the bag input then pays its bag, the folded ones
    * don't).
    *
    * `f` sees one `Option` per input, index-aligned: `None` = the key
    * never appeared in that input (outer semantics, like cogroupFold).
    */
  def cogroupNFold[K: Encoder, R: Encoder](inputs: Seq[CogroupFoldInput[K]])(
      f: (K, IndexedSeq[Option[Any]]) => IterableOnce[R]): Flow[R] = {
    require(inputs.nonEmpty, "cogroupNFold needs at least one input")
    val n = inputs.size
    val folds = inputs.map(_.fold).toIndexedSeq
    val kEnc = implicitly[Encoder[K]]
    implicit val tagged: Encoder[(K, Int, Any)] =
      Encoders.tuple(kEnc, Encoders.scalaInt, Encoders.kryo[Any])
    val unioned = inputs.zipWithIndex.map { case (in, i) =>
      in.ds.asInstanceOf[Dataset[Any]].map((t: Any) => (in.key(t), i, t))
    }.reduce(_ union _)
    val agg = new org.apache.spark.sql.expressions.Aggregator[
        (K, Int, Any), MultiFoldBuf, IndexedSeq[Option[Any]]] {
      def zero: MultiFoldBuf = MultiFoldBuf(Array.fill[Any](n)(null), Array.fill(n)(false))
      def reduce(b: MultiFoldBuf, a: (K, Int, Any)): MultiFoldBuf = {
        val i = a._2
        val cur = if (b.seen(i)) b.bufs(i) else folds(i).zero()
        b.bufs(i) = folds(i).reduce(cur, a._3)
        b.seen(i) = true
        b
      }
      def merge(x: MultiFoldBuf, y: MultiFoldBuf): MultiFoldBuf = {
        var i = 0
        while (i < n) {
          if (y.seen(i)) {
            x.bufs(i) = if (x.seen(i)) folds(i).merge(x.bufs(i), y.bufs(i)) else y.bufs(i)
            x.seen(i) = true
          }
          i += 1
        }
        x
      }
      def finish(b: MultiFoldBuf): IndexedSeq[Option[Any]] =
        (0 until n).map(i => if (b.seen(i)) Some(folds(i).finish(b.bufs(i))) else None)
      def bufferEncoder: Encoder[MultiFoldBuf] = Encoders.kryo[MultiFoldBuf]
      def outputEncoder: Encoder[IndexedSeq[Option[Any]]] =
        Encoders.kryo[IndexedSeq[Option[Any]]]
    }
    Flow(unioned.groupByKey(_._1).agg(agg.toColumn)
      .flatMap((p: (K, IndexedSeq[Option[Any]])) => f(p._1, p._2).iterator))
  }
}

/** Join shapes; the reference's required/optional per-input flags
  * (join.clj:31-45) map onto SQL outer-join kinds (pig/script.clj:329-333).
  */
sealed abstract class JoinKind(val sql: String)
object JoinKind {
  case object Inner extends JoinKind("inner")
  case object Left extends JoinKind("left_outer")
  case object Right extends JoinKind("right_outer")
  case object Full extends JoinKind("full_outer")
}

/** Result of `Flow.groupBy`: per-key aggregation surface. */
final class GroupedFlow[K, T](val kvg: KeyValueGroupedDataset[K, T]) {

  /** Materialize each group as (key, bag) — the reference's group-by shape
    * (`MapEntry[key, seq]`, join.clj:195-223). Unbounded bags; prefer
    * `fold` for aggregation at scale.
    */
  def bags(implicit e: Encoder[(K, Seq[T])]): Flow[(K, Seq[T])] =
    Flow(kvg.mapGroups((k, it) => (k, it.toSeq)))

  /** Stream each group through f (groups arrive as Iterators). */
  def mapGroups[U: Encoder](f: (K, Iterator[T]) => U): Flow[U] =
    Flow(kvg.mapGroups(f))

  def flatMapGroups[U: Encoder](f: (K, Iterator[T]) => IterableOnce[U]): Flow[U] =
    Flow(kvg.flatMapGroups((k: K, it: Iterator[T]) => f(k, it).iterator))

  /** Per-key algebraic fold → two-phase hash aggregate with map-side
    * combine (the reference's fold-in-cogroup / Algebraic UDF path,
    * SURVEY.md §2.4). This is the scale path: per-group state is the fold
    * buffer, not the group bag.
    */
  def fold[B, C: Encoder](f: Fold[T, B, C]): Flow[(K, C)] =
    Flow(kvg.agg(f.toColumn))

  def fold2[B1, C1: Encoder, B2, C2: Encoder](
      f1: Fold[T, B1, C1], f2: Fold[T, B2, C2]): Flow[(K, C1, C2)] =
    Flow(kvg.agg(f1.toColumn, f2.toColumn))

  def fold3[B1, C1: Encoder, B2, C2: Encoder, B3, C3: Encoder](
      f1: Fold[T, B1, C1], f2: Fold[T, B2, C2], f3: Fold[T, B3, C3]): Flow[(K, C1, C2, C3)] =
    Flow(kvg.agg(f1.toColumn, f2.toColumn, f3.toColumn))
}

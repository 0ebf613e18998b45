package graft.corpus

import graft.SparkTestSession
import graft.core.{Flow, Fold, JoinKind}
import org.scalatest.funsuite.AnyFunSuite

/** Random-plan differential fuzzer over the §2 surface (round-14
  * directive #5): the corpus port pins 117 KNOWN behaviors; compositions
  * are where semantics bugs hide (the reference's own oven tests exist
  * because composition broke things — oven.clj:122-159 dedup,
  * alias-self-join oven.clj:252-309). Each seed generates a random plan
  * DAG of map / mapcat / filter / remove / distinct / set ops / joins
  * (all four shapes + nil-sentinel filterBy/removeBy) / grouped folds /
  * global fold over small typed data, executes it on the ENGINE
  * ([[Flow]]) and on a ~80-line in-memory Scala reference evaluator (the
  * local.clj:151-188 analogue), and compares result MULTISETS. Any
  * divergence prints the seed + plan tree for minimization into a named
  * regression test.
  *
  * 520 seeds run in one suite; generation is a seeded
  * `scala.util.Random` chain, so every run replays the identical plan
  * population.
  */
class CorpusFuzzSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  type Row = (Long, Long)

  // ---- base data: duplicates, key collisions, negatives, an empty set
  private val Bases: Vector[Seq[Row]] = Vector(
    Seq((1L, 10L), (1L, 10L), (2L, 20L), (3L, 5L), (3L, 5L), (3L, 7L), (-1L, 4L), (0L, 0L)),
    Seq((1L, 11L), (2L, 20L), (2L, 22L), (4L, 40L), (-1L, 4L), (5L, 1L), (5L, 2L), (5L, 3L), (0L, 9L)),
    Seq((2L, 20L), (3L, 5L), (6L, 6L), (6L, 6L), (6L, 60L), (1L, 10L), (7L, -7L)),
    Seq.empty[Row])

  // ---- pure op pools shared by both evaluators
  private val Maps: Vector[Row => Row] = Vector(
    { case (a, b) => (b, a) },
    { case (a, b) => (a % 7, b + 1) },
    { case (a, b) => (a + b, a - b) },
    { case (a, b) => (a / 3, b * 2) })
  private val Mapcats: Vector[Row => Seq[Row]] = Vector(
    { case (a, b) => Seq.fill(math.floorMod(a, 3L).toInt)((a, b)) },
    { case (a, b) => Seq((a, b), (b, a)) },
    { case (a, b) => if (a % 2 == 0) Seq.empty else Seq((a, b)) })
  private val Filters: Vector[Row => Boolean] = Vector(
    { case (a, _) => a % 2 == 0 },
    { case (a, b) => b > a },
    { case (a, b) => (a + b) % 3 != 0 },
    { case (a, _) => a < 5 })

  // ---- the plan ADT
  private sealed trait Plan { def size: Int }
  private case class Src(i: Int) extends Plan { val size = 1 }
  private sealed abstract class Un(val p: Plan) extends Plan { def size = p.size + 1 }
  private sealed abstract class Bin(val a: Plan, val b: Plan) extends Plan {
    def size = a.size + b.size + 1
  }
  private case class MapP(override val p: Plan, f: Int) extends Un(p)
  private case class MapcatP(override val p: Plan, f: Int) extends Un(p)
  private case class FilterP(override val p: Plan, f: Int) extends Un(p)
  private case class RemoveP(override val p: Plan, f: Int) extends Un(p)
  private case class DistinctP(override val p: Plan) extends Un(p)
  private case class GroupFoldP(override val p: Plan, which: Int) extends Un(p)
  private case class FoldAllCountP(override val p: Plan) extends Un(p)
  private case class ConcatP(override val a: Plan, override val b: Plan) extends Bin(a, b)
  private case class UnionP(override val a: Plan, override val b: Plan) extends Bin(a, b)
  private case class InterP(override val a: Plan, override val b: Plan) extends Bin(a, b)
  private case class InterMsP(override val a: Plan, override val b: Plan) extends Bin(a, b)
  private case class DiffP(override val a: Plan, override val b: Plan) extends Bin(a, b)
  private case class DiffMsP(override val a: Plan, override val b: Plan) extends Bin(a, b)
  private case class JoinP(override val a: Plan, override val b: Plan, kind: Int) extends Bin(a, b)
  private case class FilterByP(override val a: Plan, override val b: Plan) extends Bin(a, b)
  private case class RemoveByP(override val a: Plan, override val b: Plan) extends Bin(a, b)

  private def gen(depth: Int, rnd: scala.util.Random): Plan =
    if (depth <= 0) Src(rnd.nextInt(Bases.length))
    else rnd.nextInt(16) match {
      case 0 => MapP(gen(depth - 1, rnd), rnd.nextInt(Maps.length))
      case 1 => MapcatP(gen(depth - 1, rnd), rnd.nextInt(Mapcats.length))
      case 2 => FilterP(gen(depth - 1, rnd), rnd.nextInt(Filters.length))
      case 3 => RemoveP(gen(depth - 1, rnd), rnd.nextInt(Filters.length))
      case 4 => DistinctP(gen(depth - 1, rnd))
      case 5 => GroupFoldP(gen(depth - 1, rnd), rnd.nextInt(3))
      case 6 => FoldAllCountP(gen(depth - 1, rnd))
      case 7 => ConcatP(gen(depth - 1, rnd), gen(depth - 2, rnd))
      case 8 => UnionP(gen(depth - 1, rnd), gen(depth - 2, rnd))
      case 9 => InterP(gen(depth - 1, rnd), gen(depth - 2, rnd))
      case 10 => InterMsP(gen(depth - 1, rnd), gen(depth - 2, rnd))
      case 11 => DiffP(gen(depth - 1, rnd), gen(depth - 2, rnd))
      case 12 => DiffMsP(gen(depth - 1, rnd), gen(depth - 2, rnd))
      case 13 => JoinP(gen(depth - 1, rnd), gen(depth - 2, rnd), rnd.nextInt(4))
      case 14 => FilterByP(gen(depth - 1, rnd), gen(depth - 2, rnd))
      case 15 => RemoveByP(gen(depth - 1, rnd), gen(depth - 2, rnd))
    }

  // ---- reference evaluator: sequential multiset semantics (the
  // local-mode analogue — every rule mirrors the documented contract of
  // the corresponding Flow op)
  private def evalRef(p: Plan): Seq[Row] = p match {
    case Src(i) => Bases(i)
    case MapP(q, f) => evalRef(q).map(Maps(f))
    case MapcatP(q, f) => evalRef(q).flatMap(Mapcats(f))
    case FilterP(q, f) => evalRef(q).filter(Filters(f))
    case RemoveP(q, f) => evalRef(q).filterNot(Filters(f))
    case DistinctP(q) => evalRef(q).distinct
    case GroupFoldP(q, w) =>
      evalRef(q).groupBy(_._1).toSeq.map { case (k, rows) =>
        val vs = rows.map(_._2)
        w match {
          case 0 => (k, vs.sum)            // fold sum
          case 1 => (k, vs.length.toLong)  // fold count
          case _ => (k, vs.min)            // fold min
        }
      }
    case FoldAllCountP(q) =>
      val rows = evalRef(q)
      if (rows.isEmpty) Seq.empty else Seq((rows.length.toLong, 0L))
    case ConcatP(a, b) => evalRef(a) ++ evalRef(b)
    case UnionP(a, b) => (evalRef(a) ++ evalRef(b)).distinct
    case InterP(a, b) =>
      val rb = evalRef(b).toSet
      evalRef(a).distinct.filter(rb.contains)
    case InterMsP(a, b) =>
      // multiset intersection: min of the two multiplicities per value
      val cb = evalRef(b).groupBy(identity).view.mapValues(_.size).toMap
      evalRef(a).groupBy(identity).toSeq.flatMap { case (v, occ) =>
        Seq.fill(math.min(occ.size, cb.getOrElse(v, 0)))(v)
      }
    case DiffP(a, b) =>
      val rb = evalRef(b).toSet
      evalRef(a).distinct.filterNot(rb.contains)
    case DiffMsP(a, b) =>
      // multiset difference: left multiplicity minus right multiplicity
      val cb = evalRef(b).groupBy(identity).view.mapValues(_.size).toMap
      evalRef(a).groupBy(identity).toSeq.flatMap { case (v, occ) =>
        Seq.fill(math.max(occ.size - cb.getOrElse(v, 0), 0))(v)
      }
    case JoinP(a, b, kind) =>
      val (ra, rb) = (evalRef(a), evalRef(b))
      val inner = for (t <- ra; u <- rb if t._1 == u._1) yield (t._2, u._2)
      val leftMiss = ra.filter(t => !rb.exists(_._1 == t._1)).map(t => (t._2, -99L))
      val rightMiss = rb.filter(u => !ra.exists(_._1 == u._1)).map(u => (-99L, u._2))
      kind match {
        case 0 => inner                          // inner
        case 1 => inner ++ leftMiss              // left outer
        case 2 => inner ++ rightMiss             // right outer
        case _ => inner ++ leftMiss ++ rightMiss // full outer
      }
    case FilterByP(a, b) =>
      // dup-preserving semi: inner join against the keys RELATION — each
      // key occurrence duplicates the matching row (join_test.clj:655-667)
      val keys = evalRef(b).map(_._1)
      evalRef(a).flatMap(t => keys.filter(_ == t._1).map(_ => t))
    case RemoveByP(a, b) =>
      // anti: keys de-duplicated, multiplicity from the left only
      val keys = evalRef(b).map(_._1).toSet
      evalRef(a).filterNot(t => keys.contains(t._1))
  }

  // ---- engine evaluator: the same plan on Flow
  private def evalEngine(p: Plan): Flow[Row] = {
    import spark.implicits._
    p match {
      case Src(i) => Flow.of(spark)(Bases(i))
      case MapP(q, f) => evalEngine(q).map(Maps(f))
      case MapcatP(q, f) => evalEngine(q).mapcat(Mapcats(f))
      case FilterP(q, f) => evalEngine(q).filter(Filters(f))
      case RemoveP(q, f) => evalEngine(q).remove(Filters(f))
      case DistinctP(q) => evalEngine(q).distinct
      case GroupFoldP(q, w) =>
        val g = evalEngine(q).groupBy(_._1)
        w match {
          case 0 => g.fold(Fold.sum[Long].premap((r: Row) => r._2))
          case 1 => g.fold(Fold.count[Row]).map { case (k, c) => (k, c) }
          case _ => g.fold(Fold.min[Long].premap((r: Row) => r._2))
            .map { case (k, m) => (k, m.get) } // group is never empty
        }
      case FoldAllCountP(q) =>
        evalEngine(q).foldAll(Fold.count[Row]).map(c => (c, 0L))
      case ConcatP(a, b) => evalEngine(a).concat(evalEngine(b))
      case UnionP(a, b) => evalEngine(a).union(evalEngine(b))
      case InterP(a, b) => evalEngine(a).intersection(evalEngine(b))
      case InterMsP(a, b) => evalEngine(a).intersectionMultiset(evalEngine(b))
      case DiffP(a, b) => evalEngine(a).difference(evalEngine(b))
      case DiffMsP(a, b) => evalEngine(a).differenceMultiset(evalEngine(b))
      case JoinP(a, b, kind) =>
        val k = kind match {
          case 0 => JoinKind.Inner
          case 1 => JoinKind.Left
          case 2 => JoinKind.Right
          case _ => JoinKind.Full
        }
        // outer-shape rendering: misses carry the -99 sentinel on the
        // missing side only (same as the reference evaluator)
        evalEngine(a).joinWith(evalEngine(b), k)(_._1)(_._1).map { case (l, r) =>
          (l.map(_._2).getOrElse(-99L), r.map(_._2).getOrElse(-99L))
        }
      case FilterByP(a, b) =>
        evalEngine(a).filterBy(evalEngine(b).map(_._1))(_._1)
      case RemoveByP(a, b) =>
        evalEngine(a).removeBy(evalEngine(b).map(_._1))(_._1)
    }
  }

  private def render(p: Plan): String = p match {
    case Src(i) => s"src$i"
    case MapP(q, f) => s"map$f(${render(q)})"
    case MapcatP(q, f) => s"mapcat$f(${render(q)})"
    case FilterP(q, f) => s"filter$f(${render(q)})"
    case RemoveP(q, f) => s"remove$f(${render(q)})"
    case DistinctP(q) => s"distinct(${render(q)})"
    case GroupFoldP(q, w) => s"groupFold$w(${render(q)})"
    case FoldAllCountP(q) => s"foldAllCount(${render(q)})"
    case ConcatP(a, b) => s"concat(${render(a)},${render(b)})"
    case UnionP(a, b) => s"union(${render(a)},${render(b)})"
    case InterP(a, b) => s"inter(${render(a)},${render(b)})"
    case InterMsP(a, b) => s"interMs(${render(a)},${render(b)})"
    case DiffP(a, b) => s"diff(${render(a)},${render(b)})"
    case DiffMsP(a, b) => s"diffMs(${render(a)},${render(b)})"
    case JoinP(a, b, k) => s"join$k(${render(a)},${render(b)})"
    case FilterByP(a, b) => s"filterBy(${render(a)},${render(b)})"
    case RemoveByP(a, b) => s"removeBy(${render(a)},${render(b)})"
  }

  private def check(seed: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    val plan = gen(2 + rnd.nextInt(3), rnd)
    val want = evalRef(plan).sorted
    val got = evalEngine(plan).dump().sorted
    assert(got == want,
      s"\nseed=$seed plan=${render(plan)}\n engine=$got\n    ref=$want")
  }

  // 520 seeded plans, batched 40 per ScalaTest test so a failure names
  // its 40-seed window and progress is visible in the runner output
  for (batch <- 0 until 13) {
    test(s"plans ${batch * 40 + 1}..${batch * 40 + 40} agree with the reference evaluator") {
      ((batch * 40 + 1) to (batch * 40 + 40)).foreach(check)
    }
  }
}

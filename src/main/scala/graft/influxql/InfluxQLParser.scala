package graft.influxql

/** InfluxQL textual front-end — AST + lexer + recursive-descent parser.
  *
  * The reference's declared query surface is InfluxQL via InfluxDB 1.7 +
  * Grafana (ref README.md:3,13,98-100): users type
  * `SELECT MEAN(value) FROM plc WHERE time >= t0 GROUP BY time(1m)`.
  * This parser covers the subset that surface actually uses:
  *
  * {{{
  * SELECT <field | FN(field[, p]) | TRANSFORM(FN(field)[, unit|n])> [AS alias] [, ...]
  * FROM ["db"."rp".]<measurement>          -- identifiers may be "double-quoted"
  * [WHERE time <op> <ts literal | now() ± dur> [AND ...] [AND tag <op> <literal|/re/>]]
  * [GROUP BY time(<dur>)[, tag ...] [fill(null|none|previous|linear|<num>)]]
  * [ORDER BY time [ASC|DESC]]
  * [LIMIT n] [OFFSET m]
  *
  * SHOW MEASUREMENTS | SHOW TAG KEYS [FROM m] | SHOW FIELD KEYS [FROM m]
  * CREATE CONTINUOUS QUERY name ON db BEGIN SELECT … END
  * CREATE RETENTION POLICY name ON db DURATION dur REPLICATION n [DEFAULT]
  * }}}
  *
  * Functions: COUNT MEAN SUM MIN MAX FIRST LAST SPREAD STDDEV MEDIAN
  * PERCENTILE TOP BOTTOM, plus nested transforms DERIVATIVE /
  * NON_NEGATIVE_DERIVATIVE / DIFFERENCE / NON_NEGATIVE_DIFFERENCE /
  * MOVING_AVERAGE / CUMULATIVE_SUM — the InfluxQL surface the engine
  * already implements as operators (QAgg/QWin/QInflux); the planner
  * (InfluxQLPlanner) maps each onto those proven building blocks.
  *
  * Deliberate deviations, documented: `now()`-relative bounds parse to
  * [[InfluxQLAst.NowCond]] and resolve against an INJECTABLE instant at
  * planning time (wall clock by default; pinned in tests for determinism);
  * `fill(...)` requires a bounded time range (the unbounded grid is the
  * classic InfluxQL footgun — at 100 TB an epoch-0-to-now grid is an
  * output explosion, so the planner refuses it instead).
  */
object InfluxQLAst {

  sealed trait Statement

  /** SHOW MEASUREMENTS / SHOW TAG KEYS [FROM m] / SHOW FIELD KEYS [FROM m]
    * / SHOW SERIES [CARDINALITY] — the metadata surface InfluxDB 1.7
    * clients (Grafana's query builder) poll for autocompletion.
    * LIMIT/OFFSET paginate the listing (InfluxDB 1.x supports them on the
    * SHOW statements that return row lists).
    */
  final case class Show(what: String, from: Option[String],
      limit: Option[Int] = None, offset: Option[Int] = None,
      on: Option[String] = None) extends Statement

  /** SHOW TAG VALUES [FROM m] WITH KEY <sel> [WHERE …] [LIMIT n] [OFFSET m]
    * — the statement behind Grafana template-variable dropdowns. `sel`
    * covers InfluxDB 1.x's four key selectors (`= k`, `IN (k1, k2)`,
    * `=~ /re/`, `!~ /re/`); WHERE narrows with tag conditions and/or time
    * bounds — the CHAINED-variable shape Grafana emits (values of one tag
    * restricted by another variable's selection and `$timeFilter`).
    */
  sealed trait TagKeySel
  final case class KeyEq(key: String) extends TagKeySel
  final case class KeyIn(keys: Seq[String]) extends TagKeySel
  final case class KeyRe(re: String, negate: Boolean) extends TagKeySel
  /** `cardinality` = the `SHOW TAG VALUES [EXACT] CARDINALITY` variant:
    * per-measurement count of distinct matching (key, value) pairs
    * instead of the listing (both variants compute exact counts).
    */
  final case class ShowTagValues(from: Option[String], sel: TagKeySel,
      where: Seq[Cond] = Nil, limit: Option[Int] = None,
      offset: Option[Int] = None, cardinality: Boolean = false) extends Statement

  /** DROP MEASUREMENT m — removes the measurement's partition from the
    * point store (InfluxDB's measurement deletion).
    */
  final case class DropMeasurement(name: String) extends Statement

  /** DROP SERIES [FROM m] [WHERE tag …] — deletes ALL points of the
    * matching series (InfluxDB 1.x; time bounds are not allowed — that is
    * DELETE's job). Executed against the point store by
    * [[InfluxQLPlanner.dropSeries]].
    */
  final case class DropSeries(from: Option[String], where: Seq[Cond]) extends Statement

  /** DELETE FROM m [WHERE time …/tag …] — point deletion. Planned against
    * the date-partitioned point store: fully-covered date partitions drop
    * whole (no rewrite, the retention fast path), partially-covered ones
    * rewrite with the predicate inverted.
    */
  final case class Delete(measurement: String, where: Seq[Cond]) extends Statement

  /** SHOW QUERIES / KILL QUERY <qid> — InfluxDB 1.x's task-manager surface
    * (what `influx`'s admin session uses to find and stop a runaway
    * dashboard query). Backed by [[InfluxQLQueries]]: tracked queries run
    * under their own interruptible Spark job group, so KILL maps to
    * `SparkContext.cancelJobGroupAndFutureJobs`.
    */
  case object ShowQueries extends Statement
  final case class KillQuery(qid: Long) extends Statement

  /** CREATE CONTINUOUS QUERY name ON db BEGIN SELECT … END — InfluxDB's
    * standing `GROUP BY time(n)` rollup (ref README.md:3 "continuous
    * queries"); planned onto a watermarked Structured Streaming aggregate
    * by [[InfluxQLPlanner.continuous]].
    */
  /** `everySec`/`forSec` carry the optional `RESAMPLE EVERY <d> FOR <d>`
    * clause: EVERY is the execution cadence (→ the streaming trigger
    * interval), FOR is how far back each run recomputes (→ the watermark
    * horizon: a window stays open — accepts late data — for that long).
    */
  final case class CreateCq(name: String, db: String, select: Select,
      everySec: Option[Long] = None, forSec: Option[Long] = None) extends Statement

  /** CREATE RETENTION POLICY name ON db DURATION <dur> REPLICATION n
    * [DEFAULT] — InfluxDB's TTL declaration (the reference relies on the
    * default infinite policy; dashboards routinely bound it). Enforced
    * against the date-partitioned point store by
    * [[InfluxQLPlanner.applyRetention]] → PointStore.expireRetention.
    * Replication is accepted and recorded; a Spark engine delegates
    * replication to the storage layer (HDFS/object store).
    */
  final case class CreateRetention(name: String, db: String, durationSec: Long,
      replication: Int, isDefault: Boolean) extends Statement

  /** CREATE DATABASE name [WITH [DURATION d] [REPLICATION n]
    * [SHARD DURATION d] [NAME rp]] — what the reference's own client
    * issues at connect (`create_database(plc_ip)`,
    * Linux/InfluxConnector2.py:107-109 → POST /query). Idempotent, like
    * InfluxDB's. A WITH clause folds into an initial retention policy
    * (`withRp`, named `autogen` unless NAME is given); SHARD DURATION is
    * accepted and dropped — shard sizing is InfluxDB storage internals,
    * the engine's equivalent is the store's date partitioning.
    */
  final case class CreateDatabase(name: String,
      withRp: Option[CreateRetention] = None) extends Statement

  /** DROP DATABASE name — removes the database marker, its retention
    * policies and continuous queries, and (db-per-PLC layout, SURVEY §2.1
    * S4: database ↔ `measurement=` partition) the matching measurement
    * partition's data.
    */
  final case class DropDatabase(name: String) extends Statement

  /** SHOW CONTINUOUS QUERIES / DROP CONTINUOUS QUERY name ON db — the CQ
    * lifecycle around [[CreateCq]] (InfluxDB 1.x admin flow: create →
    * list → drop).
    */
  case object ShowCqs extends Statement
  final case class DropCq(name: String, db: String) extends Statement

  /** EXPLAIN [ANALYZE] SELECT … — InfluxDB 1.x's plan inspector, mapped
    * onto the engine's REAL planner: the wire result is one series of
    * `QUERY PLAN` text rows, here Spark's formatted plan (scans with
    * PushedFilters/ReadSchema, exchanges, aggregates). ANALYZE executes
    * the query first, so the rendered plan is the ADAPTIVE FINAL one
    * (AQE's runtime re-plan — broadcast conversions, coalesced
    * partitions), which is strictly more than InfluxDB's cursor stats.
    */
  final case class Explain(select: Select, analyze: Boolean) extends Statement

  /** SHOW SHARDS — InfluxDB's shard listing mapped onto the store's
    * physical layout: one row per `measurement=…/date=…` partition (the
    * engine's shard = one day of one measurement, the retention/DELETE
    * drop unit).
    */
  case object ShowShards extends Statement

  /** SHOW STATS / SHOW DIAGNOSTICS — the admin-tool introspection pair
    * (Chronograf's health pages): STATS reports store metrics from
    * filesystem METADATA only (measurements/shards/files/bytes — never a
    * data scan) plus the live query registry; DIAGNOSTICS reports build
    * and runtime facts (engine version, Spark version, parallelism).
    */
  case object ShowStats extends Statement
  case object ShowDiagnostics extends Statement

  /** SHOW SHARD GROUPS — the grouping above [[ShowShards]]: in this
    * engine's layout one group per (measurement-db, date), the unit a
    * retention expiry drops in one operation.
    */
  case object ShowShardGroups extends Statement

  /** DROP SHARD <id> — removes the one `measurement=…/date=…` partition
    * whose SHOW SHARDS id matches (InfluxDB's targeted shard deletion,
    * the manual space-reclaim admins reach for before retention bites).
    */
  final case class DropShard(id: Long) extends Statement

  /** CREATE SUBSCRIPTION "name" ON db[.rp] DESTINATIONS ALL|ANY 'url'[, …]
    * / SHOW SUBSCRIPTIONS / DROP SUBSCRIPTION "name" ON db[.rp] — the
    * write fan-out surface Kapacitor subscribes through: every accepted
    * `/write` body forwards to the destinations (ALL = every one,
    * ANY = one, load-balanced). `rp` defaults to `autogen`.
    */
  final case class CreateSubscription(name: String, db: String, rp: String,
      mode: String, destinations: Seq[String]) extends Statement
  final case class DropSubscription(name: String, db: String, rp: String) extends Statement
  case object ShowSubs extends Statement

  /** ALTER RETENTION POLICY name ON db [DURATION d] [REPLICATION n]
    * [SHARD DURATION d] [DEFAULT] — updates only the clauses present
    * (InfluxDB requires at least one). / DROP RETENTION POLICY name ON db.
    */
  /** InfluxDB 1.x user administration — the statements behind
    * `auth-enabled = true` deployments (the reference's client presents
    * root/root credentials, Linux/InfluxConnector2.py:107, which a real
    * InfluxDB checks against this catalog):
    * `CREATE USER u WITH PASSWORD 'p' [WITH ALL PRIVILEGES]`,
    * `DROP USER u`, `SET PASSWORD FOR u = 'p'`, `SHOW USERS`,
    * `GRANT READ|WRITE|ALL [PRIVILEGES] [ON db] TO u`,
    * `REVOKE … [ON db] FROM u`, `SHOW GRANTS FOR u`.
    * `db = None` on grant/revoke is the admin-privilege form.
    */
  final case class CreateUser(name: String, password: String,
      admin: Boolean) extends Statement
  final case class DropUser(name: String) extends Statement
  case object ShowUsers extends Statement
  final case class SetPassword(name: String, password: String) extends Statement
  final case class Grant(priv: String, db: Option[String], user: String) extends Statement
  final case class Revoke(priv: String, db: Option[String], user: String) extends Statement
  final case class ShowGrants(user: String) extends Statement

  final case class AlterRetention(name: String, db: String,
      durationSec: Option[Long], replication: Option[Int],
      isDefault: Boolean) extends Statement
  final case class DropRetention(name: String, db: String) extends Statement

  /** `where` is the top-level AND list (InfluxQL's implicit conjunction);
    * OR groups live inside a [[BoolCond]] element. `groupTags == Seq("*")`
    * means GROUP BY * (every tag key — expanded against the measurement
    * catalog at planning). `groupTimeOffNs` is `time(n, offset)`'s grid
    * shift. `slimit`/`soffset` paginate SERIES (distinct tag sets), not
    * rows. `tz` buckets and renders in a named zone instead of UTC.
    */
  final case class Select(
      fields: Seq[Field],
      measurement: String,
      where: Seq[Cond],
      groupTimeNs: Option[Long],
      groupTags: Seq[String],
      fill: Fill,
      orderDesc: Boolean,
      limit: Option[Int],
      offset: Option[Int],
      into: Option[String] = None,
      fromSub: Option[Select] = None,
      groupTimeOffNs: Long = 0L,
      slimit: Option[Int] = None,
      soffset: Option[Int] = None,
      tz: Option[String] = None) extends Statement

  sealed trait Field { def alias: Option[String] }
  /** Bare field/tag projection (raw, non-aggregated select). */
  final case class RawField(name: String, alias: Option[String]) extends Field
  /** Aggregate/selector call, e.g. MEAN(value) or PERCENTILE(value, 90). */
  final case class FnField(fn: String, arg: String, param: Option[Double],
      alias: Option[String]) extends Field
  /** Transform over a bucketed aggregate, e.g. DERIVATIVE(MEAN(value), 1h)
    * or MOVING_AVERAGE(MEAN(value), 3) — the nested shape Grafana panels
    * emit. `param` is the derivative unit in seconds / the window width.
    */
  final case class TransformField(fn: String, inner: FnField, param: Option[Double],
      alias: Option[String],
      /** second numeric argument — HOLT_WINTERS(fn, N, S)'s seasonality S */
      param2: Option[Double] = None) extends Field
  /** Field arithmetic / scalar math — InfluxQL's expression surface, e.g.
    * `MEAN(value) * 100 + 5` (unit conversion, the Grafana math box) or
    * `ABS(value)` on a raw select. Requires an AS alias: a computed column
    * has no canonical InfluxQL auto-name.
    */
  final case class ExprField(expr: FExpr, alias: Option[String]) extends Field

  /** Expression tree inside an [[ExprField]]. An expression is either
    * all-aggregate (every leaf ref sits under an [[FAgg]]) or all-raw
    * ([[FRef]] leaves only) — mixing is rejected at validation, mirroring
    * InfluxQL.
    */
  sealed trait FExpr
  final case class FNum(v: Double) extends FExpr
  /** Raw field/tag reference (raw-select expressions only). */
  final case class FRef(name: String) extends FExpr
  /** Aggregate call leaf, e.g. the MEAN(value) in MEAN(value)*100. */
  final case class FAgg(call: FnField) extends FExpr
  /** Binary op, op ∈ {+, -, *, /}. Render fully parenthesizes. */
  final case class FBin(op: String, l: FExpr, r: FExpr) extends FExpr
  /** Scalar math fn (ABS, FLOOR, ROUND, POW, …); `p` is the second numeric
    * argument where the fn takes one (ROUND digits, POW exponent).
    */
  final case class FCall(fn: String, arg: FExpr, p: Option[Double]) extends FExpr

  sealed trait Cond
  /** `time <op> literal`, bound normalized to epoch nanoseconds (UTC). */
  final case class TimeCond(op: String, epochNs: Long) extends Cond
  /** `time <op> now() ± dur` — resolved against an injectable "now" at
    * planning time (InfluxQLPlanner.sql's nowNs; wall clock by default,
    * pinned in tests/CQs for determinism). offsetNs is signed.
    */
  final case class NowCond(op: String, offsetNs: Long) extends Cond
  /** `tag <op> literal` — op ∈ {=, !=, <, <=, >, >=, =~, !~}. */
  final case class TagCond(key: String, op: String, value: Any) extends Cond
  /** Parenthesized boolean combination, op ∈ {and, or}. Time bounds may
    * not appear inside (InfluxDB's own restriction: OR'd time ranges are
    * rejected) — so fill-grid bounds stay derivable from top-level conds.
    */
  final case class BoolCond(op: String, l: Cond, r: Cond) extends Cond

  sealed trait Fill
  /** No fill() clause: empty buckets are omitted (same as fill(none)). */
  case object FillMissing extends Fill
  case object FillNone extends Fill
  case object FillNull extends Fill
  case object FillPrevious extends Fill
  case object FillLinear extends Fill
  final case class FillValue(v: Double) extends Fill

  final case class InfluxQLParseException(msg: String)
      extends RuntimeException(s"InfluxQL parse error: $msg")
}

object InfluxQLParser {
  import InfluxQLAst._

  private sealed trait Tok
  private final case class TIdent(s: String) extends Tok
  private final case class TStr(s: String) extends Tok
  // raw text kept: epoch-ns time literals exceed a Double's 2^53 exact
  // range, so eager toDouble would silently round them (found by
  // InfluxQLRoundTripSpec).
  private final case class TNum(raw: String) extends Tok { def v: Double = raw.toDouble }
  private final case class TDur(ns: Long) extends Tok
  private final case class TRegex(re: String) extends Tok
  private final case class TOp(s: String) extends Tok

  // sign included: time(1h, -15m) / now()-1h lex as one negative duration
  private val DurRe = """(-?\d+)(ns|us|u|µ|ms|s|m|h|d|w)(?![A-Za-z0-9_])""".r
  private val NumRe = """-?\d+(?:\.\d+)?""".r
  private val IdentRe = """[A-Za-z_][A-Za-z0-9_]*""".r
  private val StrRe = """'([^']*)'""".r
  private val DQIdentRe = """"([^"]*)"""".r
  private val RegexRe = """/([^/]*)/""".r
  // ':' appears only in INTO :MEASUREMENT backreferences
  private val OpRe = """<=|>=|!=|=~|!~|<|>|=|\(|\)|,|\*|;|\.|\+|-|/|:""".r

  private def lex(q: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    // `/` is context-sensitive (InfluxQL too): a regex literal only ever
    // follows =~, !~ or FROM — anywhere else it is the division operator.
    var last: Option[Tok] = None
    def regexOk: Boolean = last match {
      case Some(TOp("=~")) | Some(TOp("!~")) => true
      case Some(TIdent(s))                   => s.equalsIgnoreCase("from")
      case _                                 => false
    }
    var i = 0
    while (i < q.length) {
      if (q.charAt(i).isWhitespace) i += 1
      else {
        val rest = q.substring(i)
        def take(m: scala.util.matching.Regex): Option[String] =
          m.findPrefixOf(rest)
        def emit(t: Tok): Unit = { out += t; last = Some(t) }
        take(StrRe).map { s => emit(TStr(s.substring(1, s.length - 1))); s } orElse
        // InfluxQL double-quotes IDENTIFIERS (Grafana emits "value", "cpu")
        take(DQIdentRe).map { s => emit(TIdent(s.substring(1, s.length - 1))); s } orElse
        (if (regexOk) take(RegexRe).map { s => emit(TRegex(s.substring(1, s.length - 1))); s }
         else None) orElse
        take(DurRe).map { s =>
          val DurRe(n, u) = s: @unchecked
          // nanosecond-native durations — InfluxDB 1.x's full unit set
          // (ns, u/µ, ms, s, m, h, d, w); consumers that genuinely need
          // whole seconds (retention, CQ cadence) validate at use site
          val mult = u match {
            case "w" => 604800000000000L; case "d" => 86400000000000L
            case "h" => 3600000000000L; case "m" => 60000000000L
            case "s" => 1000000000L; case "ms" => 1000000L
            case "us" | "u" | "µ" => 1000L; case _ => 1L // ns
          }
          emit(TDur(n.toLong * mult)); s
        } orElse
        take(NumRe).map { s => emit(TNum(s)); s } orElse
        take(IdentRe).map { s => emit(TIdent(s)); s } orElse
        take(OpRe).map { s => emit(TOp(s)); s } match {
          case Some(consumed) => i += consumed.length
          case None => throw InfluxQLParseException(s"unexpected input at: $rest")
        }
      }
    }
    out.result()
  }

  private val Functions = Set("count", "mean", "sum", "min", "max", "first",
    "last", "spread", "stddev", "median", "percentile", "top", "bottom",
    "mode", "integral", "distinct", "elapsed", "sample")

  /** InfluxQL 1.7 technical-analysis transforms (the Kaufman/Wilder set the
    * reference's Grafana panels can request). Each takes (aggregate, N) with
    * an integer period N; RSI/CMO/KER drop warm-up rows, so — like
    * HOLT_WINTERS — they must be the SELECT's only field.
    */
  private[influxql] val Technical = Set("relative_strength_index",
    "chande_momentum_oscillator", "kaufmans_efficiency_ratio",
    "exponential_moving_average", "double_exponential_moving_average",
    "triple_exponential_moving_average", "triple_exponential_derivative",
    "kaufmans_adaptive_moving_average", "macd", "bollinger_width", "zscore")

  private val Transforms = Set("derivative", "non_negative_derivative",
    "difference", "non_negative_difference", "moving_average", "cumulative_sum",
    "holt_winters", "holt_winters_with_fit") ++ Technical

  /** Both predictor spellings share every HOLT_WINTERS rule. */
  private def isHolt(fn: String): Boolean =
    fn == "holt_winters" || fn == "holt_winters_with_fit"

  /** InfluxQL 1.7 scalar math functions (field expressions). `round` and
    * `pow` take a second numeric argument.
    */
  private val Scalars = Set("abs", "ceil", "floor", "round", "sqrt", "exp",
    "ln", "log2", "log10", "sin", "cos", "tan", "asin", "acos", "atan", "pow")

  /** Aggregates that produce ROWS (not one value per group) or need raw
    * event order — excluded from arithmetic, transforms, and subqueries.
    */
  private val RowSelectors = Set("top", "bottom", "distinct", "elapsed", "sample")

  /** Parse an InfluxQL statement (SELECT or SHOW …) into its AST. */
  def parse(q: String): Statement = parseToks(lex(q))

  /** Parse a `;`-separated statement batch — the InfluxDB HTTP API takes
    * several statements per `q=` parameter (Grafana batches panels).
    */
  def parseAll(q: String): Seq[Statement] = {
    val toks = lex(q)
    val segments = Vector.newBuilder[Vector[Tok]]
    var cur = Vector.newBuilder[Tok]
    toks.foreach {
      case TOp(";") => segments += cur.result(); cur = Vector.newBuilder[Tok]
      case t        => cur += t
    }
    segments += cur.result()
    val parts = segments.result().filter(_.nonEmpty)
    if (parts.isEmpty) throw InfluxQLParseException("empty statement batch")
    parts.map(parseToks)
  }

  private def parseToks(toks: Vector[Tok]): Statement = {
    val p = new P(toks)
    if (p.atShow) p.show()
    else if (p.atCreate) p.create()
    else if (p.atAlter) p.alter()
    else if (p.atDrop) p.drop()
    else if (p.atDelete) p.delete()
    else if (p.atKill) p.kill()
    else if (p.atSet) p.setPassword()
    else if (p.atGrant) p.grant()
    else if (p.atRevoke) p.revoke()
    else if (p.atExplain) p.explain()
    else p.select()
  }

  /** Parse a statement known to be a SELECT (tests, typed callers). */
  def parseSelect(q: String): Select = parse(q) match {
    case s: Select => s
    case other => throw InfluxQLParseException(s"expected SELECT, parsed $other")
  }

  private final class P(toks: Vector[Tok]) {
    private var pos = 0

    private def peek: Option[Tok] = if (pos < toks.length) Some(toks(pos)) else None
    private def next(): Tok = {
      if (pos >= toks.length) throw InfluxQLParseException("unexpected end of query")
      pos += 1; toks(pos - 1)
    }
    private def kwPeek: Option[String] = peek.collect { case TIdent(s) => s.toLowerCase }
    private def eatKw(kw: String): Unit = next() match {
      case TIdent(s) if s.equalsIgnoreCase(kw) => ()
      case t => throw InfluxQLParseException(s"expected $kw, got $t")
    }
    private def eatOp(op: String): Unit = next() match {
      case TOp(`op`) => ()
      case t => throw InfluxQLParseException(s"expected '$op', got $t")
    }
    /** FROM target, possibly qualified: "db"."rp"."measurement" — the
      * shape Grafana emits. The db/retention-policy qualifiers are
      * accepted and dropped (single-store engine); the final segment is
      * the measurement.
      */
    private def measurement(): String = {
      var m = ident()
      while (peek.contains(TOp("."))) { next(); m = ident() }
      m
    }

    /** INTO target: a measurement name, possibly db.rp-qualified, or the
      * `:MEASUREMENT` backreference (InfluxDB 1.x: each source measurement
      * of a regex FROM writes into a same-named destination).
      */
    private def intoTarget(): String = {
      def backref(): String = {
        val k = ident()
        if (!k.equalsIgnoreCase("measurement"))
          throw InfluxQLParseException(s"expected :MEASUREMENT backreference, got :$k")
        ":MEASUREMENT"
      }
      if (peek.contains(TOp(":"))) { next(); backref() }
      else {
        var m = ident()
        while (peek.contains(TOp("."))) {
          next()
          if (peek.contains(TOp(":"))) { next(); return backref() }
          m = ident()
        }
        m
      }
    }

    private def ident(): String = next() match {
      case TIdent(s) => s
      case t => throw InfluxQLParseException(s"expected identifier, got $t")
    }
    private def intLit(): Int = next() match {
      case n: TNum if n.v == n.v.toInt => n.v.toInt
      case t => throw InfluxQLParseException(s"expected integer, got $t")
    }
    private def strLit(): String = next() match {
      case TStr(s) => s
      case t => throw InfluxQLParseException(s"expected 'string', got $t")
    }

    def atShow: Boolean = kwPeek.contains("show")
    def atDrop: Boolean = kwPeek.contains("drop")

    def drop(): Statement = {
      eatKw("drop")
      kwPeek match {
        case Some("measurement") =>
          next()
          val m = measurement()
          if (peek.isDefined)
            throw InfluxQLParseException(s"unexpected token after DROP MEASUREMENT: ${peek.get}")
          DropMeasurement(m)
        case Some("series") =>
          next()
          val from = if (kwPeek.contains("from")) { next(); Some(measurement()) } else None
          val where = if (kwPeek.contains("where")) { next(); condList() } else Nil
          if (from.isEmpty && where.isEmpty)
            throw InfluxQLParseException(
              "DROP SERIES requires FROM and/or WHERE (a bare drop-everything is DROP MEASUREMENT)")
          def hasTime(c: Cond): Boolean = c match {
            case BoolCond(_, l, r)        => hasTime(l) || hasTime(r)
            case _: TimeCond | _: NowCond => true
            case _                        => false
          }
          if (where.exists(hasTime))
            throw InfluxQLParseException(
              "DROP SERIES does not support time intervals — use DELETE for time-bounded deletes")
          if (peek.isDefined)
            throw InfluxQLParseException(s"unexpected token after DROP SERIES: ${peek.get}")
          DropSeries(from, where)
        case Some("database") =>
          next()
          val name = ident()
          if (peek.isDefined)
            throw InfluxQLParseException(s"unexpected token after DROP DATABASE: ${peek.get}")
          DropDatabase(name)
        case Some("continuous") =>
          next(); eatKw("query")
          val name = ident()
          eatKw("on")
          val db = ident()
          if (peek.isDefined)
            throw InfluxQLParseException(s"unexpected token after DROP CONTINUOUS QUERY: ${peek.get}")
          DropCq(name, db)
        case Some("retention") =>
          next(); eatKw("policy")
          val name = ident()
          eatKw("on")
          val db = ident()
          if (peek.isDefined)
            throw InfluxQLParseException(s"unexpected token after DROP RETENTION POLICY: ${peek.get}")
          DropRetention(name, db)
        case Some("user") =>
          next()
          val name = ident()
          if (peek.isDefined)
            throw InfluxQLParseException(s"unexpected token after DROP USER: ${peek.get}")
          DropUser(name)
        case Some("shard") =>
          next()
          val id = next() match {
            case n: TNum if n.v >= 0 && n.v == n.v.toLong => n.v.toLong
            case t => throw InfluxQLParseException(s"DROP SHARD needs a numeric id, got $t")
          }
          if (peek.isDefined)
            throw InfluxQLParseException(s"unexpected token after DROP SHARD: ${peek.get}")
          DropShard(id)
        case Some("subscription") =>
          next()
          val name = ident()
          eatKw("on")
          val (db, rp) = dbRp()
          if (peek.isDefined)
            throw InfluxQLParseException(s"unexpected token after DROP SUBSCRIPTION: ${peek.get}")
          DropSubscription(name, db, rp)
        case other => throw InfluxQLParseException(s"unsupported DROP: $other")
      }
    }
    def atDelete: Boolean = kwPeek.contains("delete")

    def delete(): Delete = {
      eatKw("delete"); eatKw("from")
      val m = measurement()
      val where = if (kwPeek.contains("where")) { next(); condList() } else Nil
      if (peek.isDefined)
        throw InfluxQLParseException(s"unexpected token after DELETE: ${peek.get}")
      Delete(m, where)
    }

    def atKill: Boolean = kwPeek.contains("kill")

    def kill(): Statement = {
      eatKw("kill"); eatKw("query")
      val id = next() match {
        case n: TNum if n.v >= 0 && n.v == n.v.toLong => n.v.toLong
        case t => throw InfluxQLParseException(s"KILL QUERY needs a numeric qid, got $t")
      }
      if (peek.isDefined)
        throw InfluxQLParseException(s"unexpected token after KILL QUERY: ${peek.get}")
      KillQuery(id)
    }

    def atCreate: Boolean = kwPeek.contains("create")

    def create(): Statement = {
      eatKw("create")
      kwPeek match {
        case Some("continuous") => createCq()
        case Some("retention")  => createRetention()
        case Some("database")   => createDatabase()
        case Some("user")       => createUser()
        case Some("subscription") => createSubscription()
        case other => throw InfluxQLParseException(s"unsupported CREATE: $other")
      }
    }

    /** ON db[.rp] — the subscription scope; rp defaults to autogen. */
    private def dbRp(): (String, String) = {
      val db = ident()
      if (peek.contains(TOp("."))) { next(); (db, ident()) } else (db, "autogen")
    }

    private def createSubscription(): CreateSubscription = {
      eatKw("subscription")
      val name = ident()
      eatKw("on")
      val (db, rp) = dbRp()
      eatKw("destinations")
      val mode = kwPeek match {
        case Some(m @ ("all" | "any")) => next(); m.toUpperCase
        case other => throw InfluxQLParseException(
          s"expected ALL or ANY after DESTINATIONS, got $other")
      }
      val urls = scala.collection.mutable.ArrayBuffer(strLit())
      while (peek.contains(TOp(","))) { next(); urls += strLit() }
      if (peek.isDefined)
        throw InfluxQLParseException(s"unexpected token after CREATE SUBSCRIPTION: ${peek.get}")
      CreateSubscription(name, db, rp, mode, urls.toSeq)
    }

    private def createUser(): CreateUser = {
      eatKw("user")
      val name = ident()
      eatKw("with"); eatKw("password")
      val pw = strLit()
      val admin =
        if (kwPeek.contains("with")) {
          next(); eatKw("all"); eatKw("privileges"); true
        } else false
      if (peek.isDefined)
        throw InfluxQLParseException(s"unexpected token after CREATE USER: ${peek.get}")
      CreateUser(name, pw, admin)
    }

    def atSet: Boolean = kwPeek.contains("set")

    def setPassword(): Statement = {
      eatKw("set"); eatKw("password"); eatKw("for")
      val name = ident()
      eatOp("=")
      val pw = strLit()
      if (peek.isDefined)
        throw InfluxQLParseException(s"unexpected token after SET PASSWORD: ${peek.get}")
      SetPassword(name, pw)
    }

    def atGrant: Boolean = kwPeek.contains("grant")
    def atRevoke: Boolean = kwPeek.contains("revoke")

    /** GRANT READ|WRITE|ALL [PRIVILEGES] [ON db] TO u — and REVOKE's
      * mirror with FROM. The no-ON ALL form is the admin toggle (InfluxDB
      * 1.x requires ALL there; READ/WRITE need a database).
      */
    private def grantRevoke(isGrant: Boolean): Statement = {
      eatKw(if (isGrant) "grant" else "revoke")
      val priv = kwPeek match {
        case Some(p @ ("read" | "write" | "all")) => next(); p.toUpperCase
        case other => throw InfluxQLParseException(
          s"expected READ, WRITE or ALL [PRIVILEGES], got $other")
      }
      if (priv == "ALL" && kwPeek.contains("privileges")) next()
      val db = if (kwPeek.contains("on")) { next(); Some(ident()) } else None
      if (db.isEmpty && priv != "ALL")
        throw InfluxQLParseException(s"$priv privilege requires ON <database>")
      eatKw(if (isGrant) "to" else "from")
      val user = ident()
      if (peek.isDefined)
        throw InfluxQLParseException(
          s"unexpected token after ${if (isGrant) "GRANT" else "REVOKE"}: ${peek.get}")
      if (isGrant) Grant(priv, db, user) else Revoke(priv, db, user)
    }
    def grant(): Statement = grantRevoke(isGrant = true)
    def revoke(): Statement = grantRevoke(isGrant = false)

    def atExplain: Boolean = kwPeek.contains("explain")

    def explain(): Statement = {
      eatKw("explain")
      val analyze = if (kwPeek.contains("analyze")) { next(); true } else false
      Explain(select(), analyze)
    }

    private def durSecLit(): Long = next() match {
      case TDur(ns) if ns % 1000000000L == 0 => ns / 1000000000L
      case TDur(_) => throw InfluxQLParseException(
        "sub-second durations are not supported for retention/CQ cadence")
      case t => throw InfluxQLParseException(s"expected duration, got $t")
    }

    private def createDatabase(): CreateDatabase = {
      eatKw("database")
      val name = ident()
      var withRp: Option[CreateRetention] = None
      if (kwPeek.contains("with")) {
        next()
        var dur: Option[Long] = None
        var repl: Option[Int] = None
        var rpName: Option[String] = None
        var sawShard = false
        var more = true
        while (more) kwPeek match {
          case Some("duration")    => next(); dur = Some(durSecLit())
          case Some("replication") => next(); repl = Some(intLit())
          case Some("shard") => // accepted, dropped (storage-internals knob)
            next(); eatKw("duration"); durSecLit(): Unit; sawShard = true
          case Some("name")        => next(); rpName = Some(ident())
          case _                   => more = false
        }
        if (dur.isEmpty && repl.isEmpty && rpName.isEmpty && !sawShard)
          throw InfluxQLParseException(
            "CREATE DATABASE WITH requires DURATION, REPLICATION, SHARD DURATION and/or NAME")
        withRp = Some(CreateRetention(rpName.getOrElse("autogen"), name,
          dur.getOrElse(0L), repl.getOrElse(1), isDefault = true))
      }
      if (peek.isDefined)
        throw InfluxQLParseException(s"unexpected token after CREATE DATABASE: ${peek.get}")
      CreateDatabase(name, withRp)
    }

    def atAlter: Boolean = kwPeek.contains("alter")

    def alter(): Statement = {
      eatKw("alter"); eatKw("retention"); eatKw("policy")
      val name = ident()
      eatKw("on")
      val db = ident()
      var dur: Option[Long] = None
      var repl: Option[Int] = None
      var isDefault = false
      var sawAny = false
      var more = true
      while (more) kwPeek match {
        case Some("duration")    => next(); dur = Some(durSecLit()); sawAny = true
        case Some("replication") => next(); repl = Some(intLit()); sawAny = true
        case Some("shard")       => next(); eatKw("duration"); durSecLit(): Unit; sawAny = true
        case Some("default")     => next(); isDefault = true; sawAny = true
        case _                   => more = false
      }
      if (!sawAny)
        throw InfluxQLParseException(
          "ALTER RETENTION POLICY requires at least one of DURATION/REPLICATION/SHARD DURATION/DEFAULT")
      if (peek.isDefined)
        throw InfluxQLParseException(s"unexpected token after ALTER RETENTION POLICY: ${peek.get}")
      AlterRetention(name, db, dur, repl, isDefault)
    }

    private def createRetention(): CreateRetention = {
      eatKw("retention"); eatKw("policy")
      val name = ident()
      eatKw("on")
      val db = ident()
      eatKw("duration")
      val dur = durSecLit()
      eatKw("replication")
      val repl = intLit()
      val isDefault = if (kwPeek.contains("default")) { next(); true } else false
      if (peek.isDefined)
        throw InfluxQLParseException(s"unexpected token after retention policy: ${peek.get}")
      CreateRetention(name, db, dur, repl, isDefault)
    }

    private def createCq(): CreateCq = {
      eatKw("continuous"); eatKw("query")
      val name = ident()
      eatKw("on")
      val db = ident()
      // RESAMPLE [EVERY <d>] [FOR <d>] — execution cadence + recompute
      // horizon (InfluxDB 1.x CQ scheduling)
      var everySec: Option[Long] = None
      var forSec: Option[Long] = None
      if (kwPeek.contains("resample")) {
        next()
        if (kwPeek.contains("every")) {
          next()
          everySec = Some(next() match {
            case TDur(ns) if ns > 0 && ns % 1000000000L == 0 => ns / 1000000000L
            case t => throw InfluxQLParseException(
              s"RESAMPLE EVERY needs a whole-second duration, got $t")
          })
        }
        if (kwPeek.contains("for")) {
          next()
          forSec = Some(next() match {
            case TDur(ns) if ns > 0 && ns % 1000000000L == 0 => ns / 1000000000L
            case t => throw InfluxQLParseException(
              s"RESAMPLE FOR needs a whole-second duration, got $t")
          })
        }
        if (everySec.isEmpty && forSec.isEmpty)
          throw InfluxQLParseException("RESAMPLE requires EVERY and/or FOR")
      }
      eatKw("begin")
      val sel = select()          // stops (without consuming) at END
      eatKw("end")
      if (peek.isDefined)
        throw InfluxQLParseException(s"unexpected token after END: ${peek.get}")
      CreateCq(name, db, sel, everySec, forSec)
    }

    def show(): Statement = {
      eatKw("show")
      // [EXACT] CARDINALITY suffix — both variants plan the exact count
      // (the estimate is an InfluxDB-internals shortcut)
      def cardinality(): Boolean =
        if (kwPeek.contains("exact")) { next(); eatKw("cardinality"); true }
        else if (kwPeek.contains("cardinality")) { next(); true }
        else false
      var on: Option[String] = None
      val what = ident().toLowerCase match {
        case "queries" =>
          if (peek.isDefined)
            throw InfluxQLParseException(s"unexpected token after SHOW QUERIES: ${peek.get}")
          return ShowQueries
        case "measurements" if kwPeek.contains("with") =>
          // SHOW MEASUREMENTS WITH MEASUREMENT =~ /re/ (or = name) — the
          // Grafana templated-variable filter; encoded through the same
          // "re:" catalog resolution as a regex FROM (plain `= name`
          // quotes to an anchored regex, so an unknown name lists empty
          // instead of erroring, InfluxDB's behavior)
          next(); eatKw("measurement")
          val re = peek match {
            case Some(TOp("=~")) => next()
              next() match {
                case TRegex(r) => r
                case t => throw InfluxQLParseException(
                  s"expected /regex/ after WITH MEASUREMENT =~, got $t")
              }
            case Some(TOp("=")) => next()
              s"^${java.util.regex.Pattern.quote(ident())}$$"
            case t => throw InfluxQLParseException(
              s"expected = or =~ after WITH MEASUREMENT, got $t")
          }
          var limit: Option[Int] = None
          var offset: Option[Int] = None
          var more = true
          while (more) kwPeek match {
            case Some("limit")  => next(); limit = Some(intLit())
            case Some("offset") => next(); offset = Some(intLit())
            case _              => more = false
          }
          if (peek.isDefined)
            throw InfluxQLParseException(s"unexpected token after SHOW MEASUREMENTS: ${peek.get}")
          return Show("measurements", Some(s"re:$re"), limit, offset)
        case "continuous" =>
          eatKw("queries")
          if (peek.isDefined)
            throw InfluxQLParseException(
              s"unexpected token after SHOW CONTINUOUS QUERIES: ${peek.get}")
          return ShowCqs
        case "users" =>
          if (peek.isDefined)
            throw InfluxQLParseException(s"unexpected token after SHOW USERS: ${peek.get}")
          return ShowUsers
        case "shards" =>
          if (peek.isDefined)
            throw InfluxQLParseException(s"unexpected token after SHOW SHARDS: ${peek.get}")
          return ShowShards
        case "shard" =>
          eatKw("groups")
          if (peek.isDefined)
            throw InfluxQLParseException(s"unexpected token after SHOW SHARD GROUPS: ${peek.get}")
          return ShowShardGroups
        case "stats" =>
          if (peek.isDefined)
            throw InfluxQLParseException(s"unexpected token after SHOW STATS: ${peek.get}")
          return ShowStats
        case "subscriptions" =>
          if (peek.isDefined)
            throw InfluxQLParseException(s"unexpected token after SHOW SUBSCRIPTIONS: ${peek.get}")
          return ShowSubs
        case "diagnostics" =>
          if (peek.isDefined)
            throw InfluxQLParseException(s"unexpected token after SHOW DIAGNOSTICS: ${peek.get}")
          return ShowDiagnostics
        case "grants" =>
          eatKw("for")
          val u = ident()
          if (peek.isDefined)
            throw InfluxQLParseException(s"unexpected token after SHOW GRANTS: ${peek.get}")
          return ShowGrants(u)
        case "measurements" => "measurements"
        case "measurement" =>
          if (!cardinality())
            throw InfluxQLParseException("expected SHOW MEASUREMENT [EXACT] CARDINALITY")
          "measurement_cardinality"
        case "databases"    => "databases"
        case "series" =>
          if (cardinality()) "series_cardinality" else "series"
        case "retention" =>
          eatKw("policies")
          // optional ON <db> — scopes the listing to that db's policies
          if (kwPeek.contains("on")) { next(); on = Some(ident()) }
          "retention_policies"
        case "tag" => ident().toLowerCase match {
          case "keys"   => if (cardinality()) "tag_key_cardinality" else "tag_keys"
          case "key" =>
            if (!cardinality())
              throw InfluxQLParseException("expected SHOW TAG KEY [EXACT] CARDINALITY")
            "tag_key_cardinality"
          case "values" => if (cardinality()) "tag_values_cardinality" else "tag_values"
          case other => throw InfluxQLParseException(s"unsupported SHOW TAG: $other")
        }
        case "field" => ident().toLowerCase match {
          case "keys" => if (cardinality()) "field_key_cardinality" else "field_keys"
          case "key" =>
            if (!cardinality())
              throw InfluxQLParseException("expected SHOW FIELD KEY [EXACT] CARDINALITY")
            "field_key_cardinality"
          case other => throw InfluxQLParseException(s"unsupported SHOW FIELD: $other")
        }
        case other => throw InfluxQLParseException(s"unsupported SHOW: $other")
      }
      // FROM accepts a plain measurement or /re/ (the Grafana templated
      // shape, e.g. SHOW TAG VALUES FROM /$m/ …) — same "re:" encoding
      // and catalog resolution as a SELECT's regex FROM
      val from = if (kwPeek.contains("from")) {
        next()
        peek match {
          case Some(TRegex(r)) => next(); Some(s"re:$r")
          case _               => Some(ident())
        }
      } else None
      val st: Statement =
        if (what == "tag_values" || what == "tag_values_cardinality") {
          eatKw("with"); eatKw("key")
          val sel: TagKeySel = peek match {
            case Some(TOp("=~")) | Some(TOp("!~")) =>
              val neg = next() == TOp("!~")
              next() match {
                case TRegex(r) => KeyRe(r, neg)
                case t => throw InfluxQLParseException(
                  s"expected /regex/ after WITH KEY ${if (neg) "!~" else "=~"}, got $t")
              }
            case Some(TOp("=")) => next(); KeyEq(ident())
            case _ if kwPeek.contains("in") =>
              next(); eatOp("(")
              val ks = scala.collection.mutable.ArrayBuffer(ident())
              while (peek.contains(TOp(","))) { next(); ks += ident() }
              eatOp(")")
              KeyIn(ks.toSeq)
            case t => throw InfluxQLParseException(
              s"expected =, =~, !~ or IN after WITH KEY, got $t")
          }
          val tvWhere = if (kwPeek.contains("where")) { next(); condList() } else Nil
          var limit: Option[Int] = None
          var offset: Option[Int] = None
          var more = true
          while (more) kwPeek match {
            case Some("limit")  => next(); limit = Some(intLit())
            case Some("offset") => next(); offset = Some(intLit())
            case _              => more = false
          }
          ShowTagValues(from, sel, tvWhere, limit, offset,
            cardinality = what == "tag_values_cardinality")
        } else {
          // LIMIT/OFFSET paginate list-returning SHOWs (InfluxDB 1.x)
          var limit: Option[Int] = None
          var offset: Option[Int] = None
          var more = true
          while (more) kwPeek match {
            case Some("limit")  => next(); limit = Some(intLit())
            case Some("offset") => next(); offset = Some(intLit())
            case _              => more = false
          }
          Show(what, from, limit, offset, on)
        }
      if (peek.isDefined)
        throw InfluxQLParseException(s"unexpected token after SHOW: ${peek.get}")
      st
    }

    def select(): Select = {
      eatKw("select")
      val fields = fieldList()
      // SELECT … INTO target FROM … — manual rollup materialization (and
      // the body of a real InfluxDB CQ); target may be db.rp.m qualified.
      val into = if (kwPeek.contains("into")) { next(); Some(intoTarget()) } else None
      eatKw("from")
      // one level of subquery: FROM ( SELECT … ) — the InfluxQL
      // aggregate-of-aggregate shape (max of hourly means).
      val (meas, fromSub) =
        if (peek.contains(TOp("("))) {
          eatOp("(")
          val inner = select()
          eatOp(")")
          (inner.measurement, Some(inner))
        } else peek match {
          // FROM /re/ — regex over the measurement catalog (a Grafana
          // templated-dashboard shape); encoded with an "re:" prefix, the
          // planner resolves it against the catalog
          case Some(TRegex(re)) => next(); (s"re:$re", None)
          case _ =>
            val first = measurement()
            if (peek.contains(TOp(","))) {
              // FROM m1, m2, … — InfluxDB's multi-measurement union.
              // Encoded as an anchored quoted-alternation regex so the
              // whole regex-FROM machinery (catalog resolution, one series
              // per measurement in the renderer, per-measurement chunking)
              // applies unchanged; Pattern.quote keeps names with regex
              // metacharacters literal.
              val ms = scala.collection.mutable.ArrayBuffer(first)
              while (peek.contains(TOp(","))) { next(); ms += measurement() }
              (s"re:^(${ms.map(java.util.regex.Pattern.quote).mkString("|")})$$", None)
            } else (first, None)
        }
      var where = Seq.empty[Cond]
      var gbTime: Option[Long] = None
      var gbOff = 0L
      var gbTags = Seq.empty[String]
      var fill: Fill = FillMissing
      var desc = false
      var limit: Option[Int] = None
      var offset: Option[Int] = None
      var slimit: Option[Int] = None
      var soffset: Option[Int] = None
      var tzName: Option[String] = None
      var done = false
      while (!done && peek.isDefined) kwPeek match {
        case Some("end")   => done = true   // CREATE CQ BEGIN … END terminator
        case Some("where") => next(); where = condList()
        case Some("group") =>
          next(); eatKw("by")
          val (t, off, tags) = groupList(); gbTime = t; gbOff = off; gbTags = tags
          if (kwPeek.contains("fill")) { next(); fill = fillSpec() }
        case Some("order") =>
          next(); eatKw("by")
          val k = ident()
          if (!k.equalsIgnoreCase("time"))
            throw InfluxQLParseException(s"ORDER BY supports only time, got $k")
          kwPeek match {
            case Some("desc") => next(); desc = true
            case Some("asc")  => next()
            case _            => ()
          }
        case Some("limit")   => next(); limit = Some(intLit())
        case Some("offset")  => next(); offset = Some(intLit())
        case Some("slimit")  => next(); slimit = Some(intLit())
        case Some("soffset") => next(); soffset = Some(intLit())
        case Some("tz") =>
          next(); eatOp("(")
          tzName = Some(next() match {
            case TStr(z) => z
            case t => throw InfluxQLParseException(s"tz() takes a quoted zone name, got $t")
          })
          eatOp(")")
        case Some(other) => throw InfluxQLParseException(s"unexpected clause: $other")
        case None if peek.contains(TOp(")")) => done = true  // end of FROM ( … )
        case None => throw InfluxQLParseException(s"unexpected token: ${peek.get}")
      }
      val sel = Select(fields, meas, where, gbTime, gbTags, fill, desc, limit, offset,
        into, fromSub, gbOff, slimit, soffset, tzName)
      validate(sel)
      sel
    }

    private def fieldList(): Seq[Field] = {
      // SELECT * — every tag and field (Grafana's explore shape); must be
      // the whole projection
      if (peek.contains(TOp("*"))) { next(); return Seq(RawField("*", None)) }
      val fs = Seq.newBuilder[Field]
      var more = true
      while (more) {
        fs += field()
        if (peek.contains(TOp(","))) next() else more = false
      }
      fs.result()
    }

    /** Two-token lookahead: is the next token a TRANSFORM( call? Transforms
      * wrap a whole bucketed series, so they stay top-level — no arithmetic
      * around them (same restriction InfluxQL applies to e.g. DERIVATIVE).
      */
    private def atTransformCall: Boolean = peek match {
      case Some(TIdent(s)) if Transforms(s.toLowerCase) =>
        pos + 1 < toks.length && toks(pos + 1) == TOp("(")
      case _ => false
    }

    private def field(): Field = {
      val base: Field =
        if (atTransformCall) {
          val name = ident()
          val fn = name.toLowerCase
          eatOp("(")
          // nested shape: TRANSFORM(AGG(field)[, unit|n]) — or the RAW
          // form TRANSFORM(field[, unit|n]) over ungrouped points (the
          // Grafana raw-series panel shape). Raw is encoded as a sentinel
          // "__raw" inner; HOLT_WINTERS and the TA set genuinely need an
          // aggregate (their state folds the bucket grid) and keep
          // requiring one.
          val innerName = ident()
          val inner =
            if (!peek.contains(TOp("("))) {
              if (isHolt(fn) || Technical(fn))
                throw InfluxQLParseException(
                  s"$name requires a nested aggregate, e.g. $name(MEAN(value))")
              FnField("__raw", innerName, None, None)
            } else aggCall(innerName)
          if (RowSelectors(inner.fn))
            throw InfluxQLParseException(s"$name cannot wrap ${inner.fn.toUpperCase}")
          val param =
            if (!peek.contains(TOp(","))) None
            else {
              next()
              // technical transforms take a bucket COUNT — a duration here
              // (the DERIVATIVE-unit habit) is rejected rather than being
              // silently read as seconds
              Some(if (Technical(fn)) numLit() else numOrDur())
            }
          val param2 =
            if (peek.contains(TOp(","))) { next(); Some(numLit()) } else None
          if (isHolt(fn)) {
            if (param.isEmpty || param2.isEmpty)
              throw InfluxQLParseException(
                "HOLT_WINTERS takes (aggregate, N, S): forecast steps and seasonality")
            val s2 = param2.get
            // S = 0 → Holt linear; S >= 2 → additive seasonal (triple
            // exponential). S = 1 is degenerate (a 1-bucket "season" is
            // just the level) and non-integer S has no meaning.
            if (s2 != s2.floor || s2 < 0 || s2 == 1 || s2 > 10000)
              throw InfluxQLParseException(
                "HOLT_WINTERS seasonality S must be 0 (Holt linear) or an " +
                  "integer 2 <= S <= 10000 (additive seasonal)")
            if (param.get < 1)
              throw InfluxQLParseException("HOLT_WINTERS needs N >= 1 forecast steps")
          } else if (param2.isDefined && fn != "macd")
            throw InfluxQLParseException(s"$name takes at most one parameter")
          if (fn == "macd") {
            // MACD(aggregate, fast, slow): two EMA periods (the 9-period
            // signal line stays a batch-side concern — the transform
            // returns the MACD line, fast EMA − slow EMA)
            if (param.isEmpty || param2.isEmpty)
              throw InfluxQLParseException(
                "MACD takes (aggregate, fast, slow): two integer EMA periods")
            val (f2, s2) = (param.get, param2.get)
            if (f2 < 1 || f2 != f2.floor || s2 != s2.floor || s2 > 100000 || f2 >= s2)
              throw InfluxQLParseException(
                "MACD needs integer periods 1 <= fast < slow <= 100000")
          } else if (Technical(fn)) {
            val n = param.getOrElse(throw InfluxQLParseException(
              s"$name takes (aggregate, N): an integer period is required"))
            // the cap keeps the planner's Int arithmetic exact (EMA's
            // alpha divides by N+1) and bounds the window frame
            if (n < 1 || n != n.floor || n > 100000)
              throw InfluxQLParseException(
                s"$name needs an integer period 1 <= N <= 100000")
            // sample variance divides by n−1: a 1-bucket window has no spread
            if (fn == "zscore" && n < 2)
              throw InfluxQLParseException("ZSCORE needs N >= 2 (sample variance)")
          }
          val f = TransformField(fn, inner, param, None, param2)
          eatOp(")")
          f
        } else fieldExpr() match {
          // single-leaf expressions collapse to the classic field shapes
          case FAgg(f) => f
          case FRef(n) => RawField(n, None)
          case e       => ExprField(e, None)
        }
      if (kwPeek.contains("as")) {
        next()
        val a = ident()
        base match {
          case f: FnField        => f.copy(alias = Some(a))
          case f: TransformField => f.copy(alias = Some(a))
          case f: RawField       => f.copy(alias = Some(a))
          case f: ExprField      => f.copy(alias = Some(a))
        }
      } else base
    }

    // ---- field expressions (InfluxQL arithmetic + scalar math) ----------

    private def fieldExpr(): FExpr = {
      var l = termExpr()
      while (peek.contains(TOp("+")) || peek.contains(TOp("-"))) {
        val TOp(op) = next(): @unchecked
        l = FBin(op, l, termExpr())
      }
      l
    }

    private def termExpr(): FExpr = {
      var l = primaryExpr()
      while (peek.contains(TOp("*")) || peek.contains(TOp("/"))) {
        val TOp(op) = next(): @unchecked
        l = FBin(op, l, primaryExpr())
      }
      l
    }

    private def primaryExpr(): FExpr = peek match {
      case Some(TOp("(")) => next(); val e = fieldExpr(); eatOp(")"); e
      case Some(n: TNum)  => next(); FNum(n.v)
      case Some(TIdent(name)) =>
        next()
        if (peek.contains(TOp("("))) {
          val fn = name.toLowerCase
          if (Scalars(fn)) {
            eatOp("(")
            val a = fieldExpr()
            val p = if (peek.contains(TOp(","))) { next(); Some(numLit()) } else None
            eatOp(")")
            FCall(fn, a, p)
          } else if (Functions(fn)) {
            eatOp("(")
            val f = aggCallBody(fn, name)
            eatOp(")")
            FAgg(f)
          } else if (Transforms(fn))
            throw InfluxQLParseException(
              s"$name is not allowed inside an expression (top-level only)")
          else throw InfluxQLParseException(s"unknown function: $name")
        } else if (peek.contains(TOp(":"))) {
          // InfluxDB's type disambiguation suffix: `name::tag` /
          // `name::field` (a raw select has no schema to resolve a bare
          // dynamic-tag name against — `host::tag` is the escape hatch).
          // The hint rides in the ref name; the planner and outName strip
          // it.
          next(); eatOp(":")
          val kind = ident().toLowerCase
          if (kind != "tag" && kind != "field")
            throw InfluxQLParseException(s"expected tag or field after '::', got $kind")
          FRef(s"$name::$kind")
        } else FRef(name)
      case t => throw InfluxQLParseException(
        s"expected expression, got ${t.getOrElse("end of query")}")
    }

    /** `NAME ( ... )` where NAME has already been consumed. */
    private def aggCall(name: String): FnField = {
      eatOp("(")
      val f = aggCallBody(name.toLowerCase, name)
      eatOp(")")
      f
    }

    /** Body of an aggregate call after its '(' — arg [, param]. Handles
      * COUNT(DISTINCT(field)) / COUNT(DISTINCT field) → fn `count_distinct`.
      * INTEGRAL's param may be a duration (the unit, e.g. 1h), normalized
      * to seconds.
      */
    private def aggCallBody(fn: String, name: String): FnField = {
      if (!Functions(fn))
        throw InfluxQLParseException(s"unknown function: $name")
      if (fn == "count" && kwPeek.contains("distinct")) {
        next()
        val arg =
          if (peek.contains(TOp("("))) { eatOp("("); val a = ident(); eatOp(")"); a }
          else ident()
        return FnField("count_distinct", arg, None, None)
      }
      // FN(*) — the wildcard-field form (InfluxDB expands * to the
      // measurement's fields; the planner resolves it against the catalog
      // and names the output fn_<field>, InfluxDB's wildcard naming)
      val arg =
        if (peek.contains(TOp("*"))) { next(); "*" } else ident()
      val param =
        if (peek.contains(TOp(","))) { next(); Some(numOrDur()) } else None
      if (Set("percentile", "top", "bottom", "sample")(fn) && param.isEmpty)
        throw InfluxQLParseException(s"${fn.toUpperCase} requires a second argument")
      FnField(fn, arg, param, None)
    }

    private def durLit(): Long = next() match {
      case TDur(ns) => ns
      case t => throw InfluxQLParseException(s"expected duration, got $t")
    }

    private def numLit(): Double = next() match {
      case n: TNum => n.v
      case t => throw InfluxQLParseException(s"expected number, got $t")
    }

    /** A number, or a duration rendered as seconds (DERIVATIVE unit). */
    private def numOrDur(): Double = next() match {
      case n: TNum => n.v
      case TDur(ns) => ns.toDouble / 1e9
      case t => throw InfluxQLParseException(s"expected number or duration, got $t")
    }

    /** Full boolean grammar (AND binds tighter than OR), then the top
      * level is flattened back to the AND list the rest of the engine
      * keys on — so `parse("(a AND b)") == parse("a AND b")`.
      */
    private def condList(): Seq[Cond] = flattenAnd(orCond())

    private def flattenAnd(c: Cond): Seq[Cond] = c match {
      case BoolCond("and", l, r) => flattenAnd(l) ++ flattenAnd(r)
      case c                     => Seq(c)
    }

    private def orCond(): Cond = {
      var l = andCond()
      while (kwPeek.contains("or")) { next(); l = BoolCond("or", l, andCond()) }
      l
    }

    private def andCond(): Cond = {
      var l = baseCond()
      while (kwPeek.contains("and")) { next(); l = BoolCond("and", l, baseCond()) }
      l
    }

    private def baseCond(): Cond =
      if (peek.contains(TOp("("))) { next(); val c = orCond(); eatOp(")"); c }
      else cond()

    private def cond(): Cond = {
      val key = ident()
      val op = next() match {
        case TOp(o) if Set("=", "!=", "<", "<=", ">", ">=", "=~", "!~")(o) => o
        case t => throw InfluxQLParseException(s"expected comparison op, got $t")
      }
      if (key.equalsIgnoreCase("time")) {
        if (op == "=~" || op == "!~")
          throw InfluxQLParseException("time does not support regex comparison")
        next() match {
          case TStr(s) => TimeCond(op, parseTimeNs(s))
          case TNum(raw) if !raw.contains('.') => TimeCond(op, raw.toLong) // raw epoch ns, exact
          case TIdent(n) if n.equalsIgnoreCase("now") =>
            eatOp("("); eatOp(")")
            // optional ± duration, e.g. now() - 1h (also unspaced now()-1h,
            // which lexes as one signed duration token)
            val offset = peek match {
              case Some(TOp("-"))            => next(); -durLit()
              case Some(TOp("+"))            => next(); durLit()
              case Some(TDur(ns)) if ns < 0  => next(); ns
              case _                         => 0L
            }
            NowCond(op, offset)
          case t => throw InfluxQLParseException(s"expected time literal, got $t")
        }
      } else next() match {
        case TStr(s)   => TagCond(key, op, s)
        case n: TNum   => TagCond(key, op, n.v)
        case TRegex(r) =>
          if (op != "=~" && op != "!~")
            throw InfluxQLParseException(s"regex literal requires =~ or !~, got $op")
          TagCond(key, op, r)
        case t => throw InfluxQLParseException(s"expected literal, got $t")
      }
    }

    private def groupList(): (Option[Long], Long, Seq[String]) = {
      var gbTime: Option[Long] = None
      var gbOff = 0L
      val tags = Seq.newBuilder[String]
      var more = true
      while (more) {
        if (peek.contains(TOp("*"))) { next(); tags += "*" }
        else {
          val name = ident()
          if (name.equalsIgnoreCase("time")) {
            eatOp("(")
            gbTime = Some(next() match {
              // the point store is microsecond-native (parquet TIMESTAMP
              // micros), so sub-µs bucket grids cannot be represented
              case TDur(ns) if ns > 0 && ns % 1000L == 0 => ns
              case TDur(_) => throw InfluxQLParseException(
                "GROUP BY time(...) must be a positive multiple of 1µs " +
                  "(microsecond-native store)")
              case t => throw InfluxQLParseException(s"expected duration, got $t")
            })
            // time(n, offset) — shifts the bucket grid; sign allowed
            if (peek.contains(TOp(","))) {
              next()
              val neg = if (peek.contains(TOp("-"))) { next(); true } else false
              val off = next() match {
                case TDur(ns) if ns % 1000L == 0 => ns
                case TDur(_) => throw InfluxQLParseException(
                  "time(n, offset) offset must be a multiple of 1µs")
                case t => throw InfluxQLParseException(s"expected offset duration, got $t")
              }
              gbOff = if (neg) -off else off
            }
            eatOp(")")
          } else tags += name
        }
        // fill(...) is lexically `fill ( ... )` — stop before it
        if (peek.contains(TOp(",")) ) next() else more = false
      }
      (gbTime, gbOff, tags.result())
    }

    private def fillSpec(): Fill = {
      eatOp("(")
      val f = next() match {
        case TIdent(s) => s.toLowerCase match {
          case "null"     => FillNull
          case "none"     => FillNone
          case "previous" => FillPrevious
          case "linear"   => FillLinear
          case other => throw InfluxQLParseException(s"unknown fill mode: $other")
        }
        case n: TNum => FillValue(n.v)
        case t => throw InfluxQLParseException(s"expected fill mode, got $t")
      }
      eatOp(")")
      f
    }

    private def validate(s: Select): Unit = {
      s.fields.foreach {
        case ExprField(e, alias) =>
          if (alias.isEmpty)
            throw InfluxQLParseException(
              "a computed expression needs an AS alias (no canonical auto-name)")
          val aggs = exprAggLeaves(e)
          if (aggs.nonEmpty && exprRefLeaves(e).nonEmpty)
            throw InfluxQLParseException(
              "cannot mix aggregate calls and raw field references in one expression")
          aggs.filter(f => RowSelectors(f.fn)).foreach(f =>
            throw InfluxQLParseException(
              s"${f.fn.toUpperCase} returns rows, not a value — not allowed in arithmetic"))
        case _ => ()
      }
      def isAggField(f: Field): Boolean = f match {
        case _: FnField | _: TransformField => true
        case ExprField(e, _)                => exprAggLeaves(e).nonEmpty
        case _                              => false
      }
      val hasFn = s.fields.exists(isAggField)
      val hasRaw = s.fields.exists(f => !isAggField(f))
      if (hasFn && hasRaw)
        throw InfluxQLParseException(
          "cannot mix aggregate and raw fields in one SELECT")
      if (!hasFn && (s.groupTimeNs.isDefined || s.groupTags.nonEmpty))
        throw InfluxQLParseException("GROUP BY requires aggregate fields")
      def isRawTf(f: Field): Boolean = f match {
        case t: TransformField => t.inner.fn == "__raw"
        case _                 => false
      }
      if (s.fields.exists(f => f.isInstanceOf[TransformField] && !isRawTf(f)) &&
          s.groupTimeNs.isEmpty)
        throw InfluxQLParseException(
          "DERIVATIVE/MOVING_AVERAGE/… over an aggregate require GROUP BY time(...)")
      if (s.fields.exists(isRawTf)) {
        // raw-point transforms window the points themselves; a time bucket
        // means the caller wanted the aggregate form
        if (s.groupTimeNs.isDefined)
          throw InfluxQLParseException(
            "a raw-point transform takes no GROUP BY time(...) — nest an aggregate, " +
              "e.g. DERIVATIVE(MEAN(value))")
        if (s.fields.size > 1)
          throw InfluxQLParseException(
            "a raw-point transform must be the SELECT's only field (it drops " +
              "warm-up rows, so it cannot align with per-point fields)")
      }
      val selectors = s.fields.collect {
        case FnField(fn, _, _, _) if RowSelectors(fn) => fn
      }
      if (selectors.nonEmpty && (s.fields.size > 1 || s.groupTimeNs.isDefined))
        throw InfluxQLParseException(
          "TOP/BOTTOM/DISTINCT/ELAPSED/SAMPLE must be the only field and take no " +
            "GROUP BY time (tags only)")
      // HOLT_WINTERS changes cardinality (one row per forecast step per
      // series) — it cannot share a SELECT with per-bucket fields
      if (s.fields.exists {
        case t: TransformField => isHolt(t.fn) || Technical(t.fn)
        case _ => false
      } && s.fields.size > 1)
        throw InfluxQLParseException(
          "HOLT_WINTERS and technical-analysis transforms (RSI/CMO/KER/EMA) " +
            "change row cardinality — must be the only field")
      if (s.fill != FillMissing && s.groupTimeNs.isEmpty)
        throw InfluxQLParseException("fill() requires GROUP BY time(...)")
      // time bounds inside an OR/parenthesized group would make the scan
      // range (and any fill grid) ambiguous — InfluxDB rejects them too
      def containsTime(c: Cond): Boolean = c match {
        case BoolCond(_, l, r)          => containsTime(l) || containsTime(r)
        case _: TimeCond | _: NowCond   => true
        case _                          => false
      }
      s.where.foreach {
        case b: BoolCond if containsTime(b) =>
          throw InfluxQLParseException(
            "time bounds cannot appear inside OR/parenthesized groups")
        case _ => ()
      }
      if (s.groupTags.contains("*") && s.groupTags.size > 1)
        throw InfluxQLParseException("GROUP BY * cannot be combined with named tags")
      if (s.groupTimeOffNs != 0 && s.groupTimeNs.isEmpty)
        throw InfluxQLParseException("time offset requires GROUP BY time(n, offset)")
      if ((s.slimit.isDefined || s.soffset.isDefined) && s.groupTags.isEmpty)
        throw InfluxQLParseException(
          "SLIMIT/SOFFSET paginate series — they require GROUP BY <tags>")
      val names = s.fields.map(outName)
      if (names.distinct.size != names.size)
        throw InfluxQLParseException(
          s"duplicate output column (add AS aliases): ${names.mkString(", ")}")
    }
  }

  /** Aggregate-call leaves of an expression tree. */
  def exprAggLeaves(e: FExpr): Seq[FnField] = e match {
    case FAgg(f)        => Seq(f)
    case FBin(_, l, r)  => exprAggLeaves(l) ++ exprAggLeaves(r)
    case FCall(_, a, _) => exprAggLeaves(a)
    case _              => Nil
  }

  /** Raw field-reference leaves of an expression tree. */
  def exprRefLeaves(e: FExpr): Seq[String] = e match {
    case FRef(n)        => Seq(n)
    case FBin(_, l, r)  => exprRefLeaves(l) ++ exprRefLeaves(r)
    case FCall(_, a, _) => exprRefLeaves(a)
    case _              => Nil
  }

  /** Strip a `::tag` / `::field` type-hint suffix off a raw reference
    * name (see primaryExpr) — output names and column lookups use the
    * bare name, like InfluxDB.
    */
  def stripHint(n: String): String =
    if (n.endsWith("::tag") || n.endsWith("::field")) n.substring(0, n.indexOf("::")) else n

  /** True when the raw reference carries the `::tag` hint. */
  def isTagHint(n: String): Boolean = n.endsWith("::tag")

  /** Output column name for a parsed field: alias, else InfluxQL default
    * (the lowercase function name; the field name for raw projections,
    * `::` hints stripped).
    */
  def outName(f: Field): String = f match {
    case FnField(fn, _, _, alias)        => alias.getOrElse(fn)
    case TransformField(fn, _, _, alias, _) => alias.getOrElse(fn)
    case RawField(name, alias)           => alias.getOrElse(stripHint(name))
    // validated non-empty for ExprField; placeholder keeps outName total
    case ExprField(_, alias)             => alias.getOrElse("expr")
  }

  /** Parse an absolute time literal to epoch nanoseconds (UTC).
    * Accepted: `2024-01-10`, `2024-01-10 06:30:00`, RFC3339 with Z.
    */
  def parseTimeNs(s: String): Long = {
    import java.time._
    import java.time.format.DateTimeFormatter
    val t = s.trim
    val inst: Instant =
      if (t.length == 10) LocalDate.parse(t).atStartOfDay(ZoneOffset.UTC).toInstant
      else if (t.endsWith("Z")) Instant.parse(t)
      else LocalDateTime.parse(t, DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
        .toInstant(ZoneOffset.UTC)
    inst.getEpochSecond * 1000000000L + inst.getNano
  }
}

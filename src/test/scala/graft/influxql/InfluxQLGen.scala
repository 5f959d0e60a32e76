package graft.influxql

import org.scalacheck.Gen

import InfluxQLAst._

/** Shared ScalaCheck generators over the accepted InfluxQL grammar — used
  * by the parse/render round-trip (InfluxQLRoundTripSpec) and the planner
  * totality fuzz (InfluxQLPlanFuzzSpec).
  */
object InfluxQLGen {

  val genAggFn: Gen[String] = Gen.oneOf(
    "count", "mean", "sum", "min", "max", "first", "last", "spread", "stddev",
    "median", "mode")

  def genAgg(alias: Option[String]): Gen[FnField] =
    Gen.frequency(
      7 -> genAggFn.map(fn => FnField(fn, "value", None, alias)),
      2 -> Gen.choose(1, 99).map(p => FnField("percentile", "value", Some(p.toDouble), alias)),
      1 -> Gen.oneOf(None, Some(60.0), Some(3600.0))
        .map(u => FnField("integral", "value", u, alias)),
      1 -> Gen.const(FnField("count_distinct", "user_id", None, alias)))

  /** Arithmetic over aggregate leaves — binary ops, scalar fns, literals.
    * Always aliased (the parser requires it). Leaves avoid row selectors
    * and keep FAgg/FNum only so the expression stays all-aggregate.
    */
  def genFExpr(depth: Int): Gen[FExpr] =
    if (depth <= 0)
      Gen.frequency(
        3 -> genAgg(None).suchThat(f => !Set("top", "bottom", "distinct")(f.fn)).map(FAgg.apply),
        1 -> Gen.choose(-50, 100).map(n => FNum(n.toDouble)))
    else Gen.frequency(
      4 -> Gen.lzy(for {
        op <- Gen.oneOf("+", "-", "*", "/")
        l <- genFExpr(depth - 1)
        r <- genFExpr(depth - 1)
      } yield FBin(op, l, r)),
      2 -> Gen.lzy(for {
        fn <- Gen.oneOf("abs", "floor", "ceil", "sqrt", "log10")
        a <- genFExpr(depth - 1)
      } yield FCall(fn, a, None)),
      1 -> Gen.lzy(genFExpr(depth - 1).map(a => FCall("pow", a, Some(2.0)))),
      2 -> genFExpr(0))

  def genExprField(alias: Option[String]): Gen[ExprField] =
    Gen.choose(1, 3).flatMap(genFExpr).suchThat { e =>
      val isLeaf = e match {
        // a bare leaf collapses to FnField/RawField on reparse
        case _: FAgg | _: FRef | _: FNum => true
        case _                           => false
      }
      // all-literal expressions don't count as aggregate fields (rejected
      // when mixed with aggregates / GROUP BY)
      !isLeaf && InfluxQLParser.exprAggLeaves(e).nonEmpty
    }.map(e => ExprField(e, alias))

  def genTransform(alias: Option[String]): Gen[TransformField] = for {
    fn <- Gen.oneOf("derivative", "non_negative_derivative", "difference",
      "non_negative_difference", "moving_average", "cumulative_sum")
    inner <- genAgg(None)
    param <- Gen.option(Gen.choose(2, 100).map(_.toDouble))
  } yield TransformField(fn, inner, param, alias)

  val genTimeBounds: Gen[Seq[Cond]] = for {
    lo <- Gen.choose(1704067200000000000L, 1705000000000000000L)
    span <- Gen.choose(1000000000L, 604800000000000L)
    loOp <- Gen.oneOf(">=", ">")
    hiOp <- Gen.oneOf("<", "<=")
  } yield Seq(TimeCond(loOp, lo), TimeCond(hiOp, lo + span))

  val genTagCond: Gen[Cond] = Gen.oneOf(
    Gen.oneOf("click", "view", "purchase").map(v => TagCond("event_type", "=", v)),
    Gen.choose(1, 99).map(v => TagCond("user_id", "=", v.toDouble)),
    Gen.const(TagCond("event_type", "=~", "^(cl|pu)")),
    Gen.const(TagCond("event_type", "!~", "^er")))

  /** Tag-only boolean groups (time bounds inside OR are rejected). The
    * root is always OR: a top-level AND group canonicalizes to the flat
    * AND list on reparse, so it would not round-trip structurally.
    */
  val genBoolCond: Gen[Cond] = for {
    l <- genTagCond
    r <- Gen.oneOf(genTagCond, Gen.lzy(for {
      l2 <- genTagCond; r2 <- genTagCond; op2 <- Gen.oneOf("or", "and")
    } yield BoolCond(op2, l2, r2)))
  } yield BoolCond("or", l, r)

  val genNowBounds: Gen[Seq[Cond]] = for {
    backSec <- Gen.choose(60L, 604800L)
    hi <- Gen.oneOf(Seq.empty[Cond], Seq(NowCond("<", 0L)))
  } yield NowCond(">=", -backSec * 1000000000L) +: hi

  val genWhere: Gen[Seq[Cond]] = for {
    t <- Gen.oneOf(Gen.const(Seq.empty[Cond]), genTimeBounds, genNowBounds)
    tag <- Gen.option(Gen.frequency(3 -> genTagCond, 1 -> genBoolCond))
  } yield t ++ tag.toSeq

  val genTags: Gen[Seq[String]] =
    Gen.oneOf(Seq.empty, Seq("user_id"), Seq("event_type"), Seq("event_type", "user_id"))

  val genFill: Gen[Fill] = Gen.oneOf(
    FillMissing, FillNone, FillNull, FillPrevious, FillLinear, FillValue(0), FillValue(1.5))

  val genTail: Gen[(Boolean, Option[Int], Option[Int])] = for {
    desc <- Gen.oneOf(true, false)
    limit <- Gen.option(Gen.choose(1, 1000))
    offset <- if (limit.isDefined) Gen.option(Gen.choose(1, 100)) else Gen.const(None)
  } yield (desc, limit, offset)

  def aliased[F <: Field](i: Int, g: Option[String] => Gen[F]): Gen[F] =
    g(Some(s"f$i"))

  // durations are NANOSECONDS in the AST (sub-second grids included —
  // 250ms and 500µs exercise the µs-native bucket path)
  val genAggSelect: Gen[Select] = for {
    gbTime <- Gen.option(Gen.oneOf(60000000000L, 300000000000L, 3600000000000L,
      86400000000000L, 250000000L, 500000L))
    gbOff <- if (gbTime.isDefined)
      Gen.oneOf(0L, 0L, 0L, 1800000000000L, -900000000000L) else Gen.const(0L)
    n <- Gen.choose(1, 3)
    fields <- Gen.sequence[Seq[Field], Field]((0 until n).map(i =>
      if (gbTime.isDefined) Gen.frequency[Field](
        6 -> aliased(i, genAgg), 2 -> aliased(i, genTransform),
        2 -> aliased(i, genExprField))
      else Gen.frequency[Field](
        8 -> aliased(i, genAgg), 2 -> aliased(i, genExprField))))
    where <- genWhere
    tags <- Gen.frequency(5 -> genTags, 1 -> Gen.const(Seq("*")))
    // sub-second grids over the generator's day-scale WHERE ranges exceed
    // the planner's max-select-buckets fill guard — keep them fill-free
    fill <- if (gbTime.exists(_ >= 1000000000L)) genFill
            else Gen.const[Fill](FillMissing)
    (desc, limit, offset) <- genTail
    slimit <- if (tags.nonEmpty) Gen.option(Gen.choose(1, 20)) else Gen.const(None)
    soffset <- if (slimit.isDefined) Gen.option(Gen.choose(1, 5)) else Gen.const(None)
    tzOpt <- Gen.option(Gen.oneOf("America/New_York", "Europe/Warsaw"))
    into <- Gen.option(Gen.const("rollup_1h"))
  } yield Select(fields, "events", where, gbTime, tags, fill, desc, limit, offset,
    into, None, gbOff, slimit, soffset, tzOpt)

  val genRawSelect: Gen[Select] = for {
    fields <- Gen.someOf(Seq("value", "user_id", "event_type")).suchThat(_.nonEmpty)
    where <- genWhere
    (desc, limit, offset) <- genTail
  } yield Select(fields.map(f => RawField(f, None)).toSeq, "events", where,
    None, Nil, FillMissing, desc, limit, offset)

  val genTop: Gen[Select] = for {
    fn <- Gen.oneOf("top", "bottom")
    k <- Gen.choose(1, 20)
    tags <- genTags
    where <- genWhere
  } yield Select(Seq(FnField(fn, "value", Some(k.toDouble), Some("t0"))),
    "events", where, None, tags, FillMissing, orderDesc = false, None, None)

  /** Technical-analysis transforms (RSI/CMO/KER/EMA family/KAMA/MACD/
    * BOLLINGER_WIDTH): must be the SELECT's only field, need GROUP BY
    * time, and the recursive ones need a bounded WHERE — generate the
    * whole Select shape directly. Grids stay ≥ 1 m over ≤ 2-day ranges
    * so the per-series folds are bucket-bounded.
    */
  val genTechnicalSelect: Gen[Select] = for {
    fn <- Gen.oneOf("relative_strength_index", "chande_momentum_oscillator",
      "kaufmans_efficiency_ratio", "exponential_moving_average",
      "double_exponential_moving_average", "triple_exponential_moving_average",
      "triple_exponential_derivative", "kaufmans_adaptive_moving_average",
      "macd", "bollinger_width")
    // map, don't filter (the genSelect convention): INTEGRAL is context-
    // bound (needs raw point order) and refuses inside a transform by
    // documented design — swap it for SUM instead of discarding the case
    inner <- genAgg(None).map(f =>
      if (f.fn == "integral") f.copy(fn = "sum", param = None) else f)
    n <- Gen.choose(2, 9)
    p2 <- if (fn == "macd") Gen.choose(10, 30).map(s => Some(s.toDouble))
          else Gen.const(None)
    gbTime <- Gen.oneOf(60000000000L, 300000000000L, 3600000000000L)
    lo <- Gen.choose(1704067200000000000L, 1704153600000000000L)
    span <- Gen.choose(3600000000000L, 172800000000000L)
    tags <- Gen.oneOf(Seq.empty[String], Seq("user_id"), Seq("event_type"))
    (desc, limit, offset) <- genTail
  } yield Select(
    fields = Seq(TransformField(fn, inner, Some(n.toDouble), Some("t0"), p2)),
    measurement = "events",
    where = Seq(TimeCond(">=", lo), TimeCond("<", lo + span)),
    groupTimeNs = Some(gbTime), groupTags = tags, fill = FillMissing,
    orderDesc = desc, limit = limit, offset = offset)

  val genSelect: Gen[Select] =
    Gen.frequency(6 -> genAggSelect, 3 -> genRawSelect, 1 -> genTop,
      2 -> genTechnicalSelect)

  val genDelete: Gen[Statement] = for {
    m <- Gen.oneOf("events", "plc1")
    where <- Gen.oneOf(
      Gen.const(Seq.empty[Cond]),
      genTimeBounds,
      genTimeBounds.map(_ :+ TagCond("alias", "=", "plc1_temp")))
  } yield Delete(m, where)

  /** SHOW TAG VALUES over the full r7 shape: all four key selectors,
    * optional WHERE (the chained-template-variable form), LIMIT/OFFSET.
    */
  val genShowTagValues: Gen[Statement] = for {
    from <- Gen.option(Gen.oneOf("events", "re:^ev", "re:ents$"))
    sel <- Gen.frequency[TagKeySel](
      3 -> Gen.oneOf("event_type", "user_id").map(KeyEq.apply),
      2 -> Gen.someOf(Seq("event_type", "user_id")).suchThat(_.nonEmpty)
        .map(ks => KeyIn(ks.toSeq)),
      2 -> (for {
        re <- Gen.oneOf("type", "^ev", "id$")
        neg <- Gen.oneOf(true, false)
      } yield KeyRe(re, neg)))
    where <- genWhere
    limit <- Gen.option(Gen.choose(1, 20))
    offset <- Gen.option(Gen.choose(1, 5))
    cardinality <- Gen.frequency(3 -> false, 1 -> true)
  } yield ShowTagValues(from, sel, where, limit, offset, cardinality)

  val genStatement: Gen[Statement] = Gen.frequency(
    8 -> genSelect,
    1 -> genShowTagValues,
    1 -> (for {
      what <- Gen.oneOf("measurements", "tag_keys", "field_keys",
        "databases", "series", "series_cardinality",
        "measurement_cardinality", "tag_key_cardinality", "field_key_cardinality")
      from <- if (Set("databases", "measurement_cardinality").contains(what)) Gen.const(None)
              else Gen.option(Gen.oneOf("events", "re:^ev"))
      limit <- Gen.option(Gen.choose(1, 20))
      offset <- Gen.option(Gen.choose(1, 5))
    } yield Show(what, from, limit, offset)),
    1 -> genDelete,
    1 -> (for {
      from <- Gen.option(Gen.const("plc1"))
      where <- Gen.oneOf(
        Gen.const(Seq[Cond](TagCond("alias", "=", "plc1_temp"))),
        Gen.const(Seq[Cond](TagCond("alias", "!=", "x"))))
    } yield DropSeries(from, where)),
    1 -> (for {
      s <- genSelect.suchThat(s =>
        s.groupTimeNs.isDefined && s.where.isEmpty && s.limit.isEmpty &&
        s.fill == FillMissing && !s.orderDesc)
      every <- Gen.option(Gen.oneOf(30L, 60L, 300L))
      forS <- Gen.option(Gen.oneOf(120L, 600L))
    } yield CreateCq("cq1", "plc", s, every, forS)),
    // r8 admin lifecycle statements — every variant the parser accepts
    1 -> (for {
      name <- Gen.oneOf("plc1", "db_x")
      rp <- Gen.option(for {
        dur <- Gen.oneOf(86400L, 7L * 86400L)
        repl <- Gen.choose(1, 3)
        rpName <- Gen.oneOf("autogen", "rp1")
      } yield CreateRetention(rpName, name, dur, repl, isDefault = true))
    } yield CreateDatabase(name, rp)),
    1 -> Gen.oneOf(
      DropDatabase("plc1"), ShowCqs, DropCq("cq1", "plc"),
      ShowUsers, ShowShards, ShowShardGroups, ShowStats, ShowDiagnostics, DropUser("u1"), DropShard(42L),
      ShowGrants("u1"), SetPassword("u1", "pw"), ShowSubs,
      CreateSubscription("s1", "plc", "autogen", "ALL", Seq("http://h1:9092")),
      DropSubscription("s1", "plc", "autogen")),
    1 -> (for {
      name <- Gen.oneOf("rp1", "keep2w")
      dur <- Gen.option(Gen.oneOf(86400L, 14L * 86400L))
      repl <- Gen.option(Gen.choose(1, 3))
      dflt <- Gen.oneOf(true, false)
      if dur.isDefined || repl.isDefined || dflt
    } yield AlterRetention(name, "plc", dur, repl, dflt)),
    1 -> (for {
      name <- Gen.identifier.map(s => "u" + s.take(6))
      pw <- Gen.alphaNumStr.map(s => "p" + s.take(8))
      admin <- Gen.oneOf(true, false)
    } yield CreateUser(name, pw, admin)),
    1 -> (for {
      priv <- Gen.oneOf("READ", "WRITE", "ALL")
      db <- if (priv == "ALL") Gen.option(Gen.const("plc")) else Gen.const(Some("plc"))
      user <- Gen.oneOf("u1", "grafana")
      isGrant <- Gen.oneOf(true, false)
    } yield if (isGrant) Grant(priv, db, user) else Revoke(priv, db, user)),
    1 -> (for {
      s <- genSelect
      analyze <- Gen.oneOf(true, false)
    } yield Explain(s, analyze)),
    // r8 raw-point transforms: TRANSFORM(field[, p]) with no GROUP BY time
    1 -> (for {
      fn <- Gen.oneOf("derivative", "non_negative_derivative", "difference",
        "non_negative_difference", "moving_average", "cumulative_sum")
      param <- fn match {
        case "moving_average" => Gen.choose(2, 5).map(n => Some(n.toDouble))
        case "derivative" | "non_negative_derivative" =>
          Gen.option(Gen.oneOf(1.0, 60.0, 3600.0))
        case _ => Gen.const(None)
      }
      tags <- Gen.oneOf(Seq.empty[String], Seq("user_id"), Seq("event_type"))
      limit <- Gen.option(Gen.choose(1, 10))
    } yield Select(
      fields = Seq(TransformField(fn, FnField("__raw", "value", None, None), param, None, None)),
      measurement = "events",
      where = Seq(TimeCond(">=", 1704067200000000000L), TimeCond("<", 1704240000000000000L)),
      groupTimeNs = None, groupTags = tags, fill = FillMissing,
      orderDesc = false, limit = limit, offset = None)))

}

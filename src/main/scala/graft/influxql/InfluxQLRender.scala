package graft.influxql

import InfluxQLAst._

/** Statement → canonical InfluxQL text. The inverse of [[InfluxQLParser]]
  * (`parse(render(ast)) == ast`, property-tested in InfluxQLRoundTripSpec)
  * — used to display/normalize registered continuous queries and to log
  * planned statements in a user-recognizable form.
  */
object InfluxQLRender {

  /** Nanosecond duration → the most compact whole-unit InfluxQL literal
    * (so the round-trip property holds for sub-second grids too). */
  private def durStr(ns: Long): String =
    if (ns % 1000000000L == 0) s"${ns / 1000000000L}s"
    else if (ns % 1000000L == 0) s"${ns / 1000000L}ms"
    else if (ns % 1000L == 0) s"${ns / 1000L}u"
    else s"${ns}ns"

  def render(st: Statement): String = st match {
    case sh: Show =>
      val head = sh.what match {
        case "measurements"       => s"SHOW MEASUREMENTS${fromClause(sh.from)}"
        case "tag_keys"           => s"SHOW TAG KEYS${fromClause(sh.from)}"
        case "field_keys"         => s"SHOW FIELD KEYS${fromClause(sh.from)}"
        case "databases"          => "SHOW DATABASES"
        case "series"             => s"SHOW SERIES${fromClause(sh.from)}"
        case "series_cardinality" => s"SHOW SERIES CARDINALITY${fromClause(sh.from)}"
        case "measurement_cardinality" => "SHOW MEASUREMENT CARDINALITY"
        case "tag_key_cardinality"   => s"SHOW TAG KEY CARDINALITY${fromClause(sh.from)}"
        case "field_key_cardinality" => s"SHOW FIELD KEY CARDINALITY${fromClause(sh.from)}"
        case "retention_policies" =>
          "SHOW RETENTION POLICIES" + sh.on.fold("")(db => s" ON $db")
        case other => throw InfluxQLParseException(s"unrenderable SHOW: $other")
      }
      head + sh.limit.fold("")(n => s" LIMIT $n") + sh.offset.fold("")(n => s" OFFSET $n")
    case ShowTagValues(from, sel, where, limit, offset, cardinality) =>
      val key = sel match {
        case KeyEq(k)        => s"= $k"
        case KeyIn(ks)       => s"IN (${ks.mkString(", ")})"
        case KeyRe(r, false) => s"=~ /$r/"
        case KeyRe(r, true)  => s"!~ /$r/"
      }
      val card = if (cardinality) " CARDINALITY" else ""
      s"SHOW TAG VALUES$card${fromClause(from)} WITH KEY $key" +
        (if (where.isEmpty) "" else " WHERE " + where.map(cond).mkString(" AND ")) +
        limit.fold("")(n => s" LIMIT $n") + offset.fold("")(n => s" OFFSET $n")
    case ShowQueries              => "SHOW QUERIES"
    case KillQuery(qid)           => s"KILL QUERY $qid"
    case DropMeasurement(name)    => s"DROP MEASUREMENT $name"
    case DropSeries(from, where) =>
      s"DROP SERIES${fromClause(from)}" +
        (if (where.isEmpty) "" else " WHERE " + where.map(cond).mkString(" AND "))
    case Delete(m, where) =>
      s"DELETE FROM $m" +
        (if (where.isEmpty) "" else " WHERE " + where.map(cond).mkString(" AND "))
    case CreateCq(name, db, sel, every, forS) =>
      val resample =
        if (every.isEmpty && forS.isEmpty) ""
        else " RESAMPLE" + every.fold("")(s => s" EVERY ${s}s") +
          forS.fold("")(s => s" FOR ${s}s")
      s"CREATE CONTINUOUS QUERY $name ON $db$resample BEGIN ${render(sel)} END"
    case CreateRetention(name, db, durSec, repl, isDefault) =>
      s"CREATE RETENTION POLICY $name ON $db DURATION ${durSec}s REPLICATION $repl" +
        (if (isDefault) " DEFAULT" else "")
    case CreateDatabase(name, withRp) =>
      s"CREATE DATABASE $name" + withRp.fold("")(rp =>
        s" WITH DURATION ${rp.durationSec}s REPLICATION ${rp.replication} NAME ${rp.name}")
    case DropDatabase(name) => s"DROP DATABASE $name"
    case ShowCqs            => "SHOW CONTINUOUS QUERIES"
    case DropCq(name, db)   => s"DROP CONTINUOUS QUERY $name ON $db"
    case AlterRetention(name, db, dur, repl, isDefault) =>
      s"ALTER RETENTION POLICY $name ON $db" +
        dur.fold("")(d => s" DURATION ${d}s") +
        repl.fold("")(r => s" REPLICATION $r") +
        (if (isDefault) " DEFAULT" else "")
    case DropRetention(name, db) => s"DROP RETENTION POLICY $name ON $db"
    case CreateUser(name, pw, admin) =>
      s"CREATE USER $name WITH PASSWORD '$pw'" +
        (if (admin) " WITH ALL PRIVILEGES" else "")
    case DropUser(name)         => s"DROP USER $name"
    case ShowUsers              => "SHOW USERS"
    case SetPassword(name, pw)  => s"SET PASSWORD FOR $name = '$pw'"
    case Grant(priv, db, user)  =>
      s"GRANT $priv${db.fold("")(d => s" ON $d")} TO $user"
    case Revoke(priv, db, user) =>
      s"REVOKE $priv${db.fold("")(d => s" ON $d")} FROM $user"
    case ShowGrants(user)       => s"SHOW GRANTS FOR $user"
    case ShowShards             => "SHOW SHARDS"
    case ShowShardGroups        => "SHOW SHARD GROUPS"
    case ShowStats              => "SHOW STATS"
    case ShowDiagnostics        => "SHOW DIAGNOSTICS"
    case DropShard(id)          => s"DROP SHARD $id"
    case CreateSubscription(name, db, rp, mode, dests) =>
      s"CREATE SUBSCRIPTION $name ON $db.$rp DESTINATIONS $mode " +
        dests.map(d => s"'$d'").mkString(", ")
    case DropSubscription(name, db, rp) => s"DROP SUBSCRIPTION $name ON $db.$rp"
    case ShowSubs                       => "SHOW SUBSCRIPTIONS"
    case Explain(sel, analyze)  =>
      s"EXPLAIN ${if (analyze) "ANALYZE " else ""}${render(sel)}"
    case s: Select => renderSelect(s)
  }

  private def fromClause(from: Option[String]): String =
    from.fold("") {
      case m if m.startsWith("re:") => s" FROM /${m.drop(3)}/"
      case m                        => s" FROM $m"
    }

  private def renderSelect(s: Select): String = {
    val sb = new StringBuilder("SELECT ")
    sb ++= s.fields.map(field).mkString(", ")
    s.into.foreach(t => sb ++= s" INTO $t")
    s.fromSub match {
      case Some(sub) => sb ++= s" FROM (${renderSelect(sub)})"
      case None if s.measurement.startsWith("re:") =>
        sb ++= s" FROM /${s.measurement.drop(3)}/"
      case None      => sb ++= s" FROM ${s.measurement}"
    }
    if (s.where.nonEmpty) sb ++= " WHERE " + s.where.map(cond).mkString(" AND ")
    val timeGroup = s.groupTimeNs.map { ns =>
      if (s.groupTimeOffNs == 0) s"time(${durStr(ns)})"
      else if (s.groupTimeOffNs < 0) s"time(${durStr(ns)}, -${durStr(-s.groupTimeOffNs)})"
      else s"time(${durStr(ns)}, ${durStr(s.groupTimeOffNs)})"
    }
    val groups = timeGroup.toSeq ++ s.groupTags
    if (groups.nonEmpty) {
      sb ++= " GROUP BY " + groups.mkString(", ")
      fill(s.fill).foreach(f => sb ++= s" fill($f)")
    }
    if (s.orderDesc) sb ++= " ORDER BY time DESC"
    s.limit.foreach(n => sb ++= s" LIMIT $n")
    s.offset.foreach(n => sb ++= s" OFFSET $n")
    s.slimit.foreach(n => sb ++= s" SLIMIT $n")
    s.soffset.foreach(n => sb ++= s" SOFFSET $n")
    s.tz.foreach(z => sb ++= s" tz('$z')")
    sb.result()
  }

  private def field(f: Field): String = {
    val base = f match {
      case RawField(name, _) => name
      case FnField(fn, arg, param, _) => fnCall(fn, arg, param)
      case TransformField(fn, inner, param, _, param2) =>
        // "__raw" marks the raw-point form: the inner is a bare field
        val in =
          if (inner.fn == "__raw") inner.arg
          else fnCall(inner.fn, inner.arg, inner.param)
        s"${fn.toUpperCase}($in${param.fold("")(p => s", ${num(p)}")}" +
          s"${param2.fold("")(p => s", ${num(p)}")})"
      case ExprField(e, _) => expr(e)
    }
    f.alias.fold(base)(a => s"$base AS $a")
  }

  private def fnCall(fn: String, arg: String, param: Option[Double]): String =
    if (fn == "count_distinct") s"COUNT(DISTINCT($arg))"
    else s"${fn.toUpperCase}($arg${param.fold("")(p => s", ${num(p)}")})"

  /** Binary ops are fully parenthesized so precedence round-trips with no
    * precedence logic in the renderer.
    */
  private def expr(e: FExpr): String = e match {
    case FNum(v)         => num(v)
    case FRef(n)         => n
    case FAgg(f)         => fnCall(f.fn, f.arg, f.param)
    case FBin(op, l, r)  => s"(${expr(l)} $op ${expr(r)})"
    case FCall(fn, a, p) => s"${fn.toUpperCase}(${expr(a)}${p.fold("")(x => s", ${num(x)}")})"
  }

  private def cond(c: Cond): String = c match {
    case TimeCond(op, ns)            => s"time $op $ns"
    case NowCond(op, 0)              => s"time $op now()"
    case NowCond(op, off) =>
      val sign = if (off < 0) "-" else "+"
      s"time $op now() $sign ${math.abs(off) / 1000000000L}s"
    case TagCond(key, op, re: String) if op == "=~" || op == "!~" => s"$key $op /$re/"
    case TagCond(key, op, v: String) => s"$key $op '$v'"
    case TagCond(key, op, v: Double) => s"$key $op ${num(v)}"
    case TagCond(key, op, v)         => s"$key $op $v"
    case BoolCond(op, l, r)          => s"(${cond(l)} ${op.toUpperCase} ${cond(r)})"
  }

  /** Whole doubles print as integers so the token round-trips. */
  private def num(v: Double): String =
    if (v == v.toLong) v.toLong.toString else v.toString

  private def fill(f: Fill): Option[String] = f match {
    case FillMissing  => None
    case FillNone     => Some("none")
    case FillNull     => Some("null")
    case FillPrevious => Some("previous")
    case FillLinear   => Some("linear")
    case FillValue(v) => Some(num(v))
  }
}

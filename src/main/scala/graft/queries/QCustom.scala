package graft.queries

import org.apache.spark.sql.functions._
import graft.GraftQuery
import graft.functions.{DecodeS7, EmaAggregator, S7}
import graft.sinks.LineProtocol
import graft.sources.ConfigXml
import Q._

/** The custom components as query-inventory entries — SURVEY.md §2.1 S1
  * (XML config scan), §2.10 D3 (DecodeS7), D4 (EMA aggregator), S3
  * (line-protocol shaping), plus the multimodal binary-column plumbing.
  */
object QCustom {

  /** Deterministic reference-schema tag catalog (mirrors the XML written by
    * ConfigApp/ConfigApp.py:54-84; address forms from README.md:45-51).
    */
  val SampleConfigXml: String = {
    val plcs = (1 to 3).map { p =>
      // Tag order mirrors the sim source's register cycle (Real, Word,
      // DWord, Bit) so positional enrichment is type-consistent.
      val tags = Seq(
        ("S7WLReal", "S7AreaDB", s"DB$p.DBD0", s"plc${p}_temp", "True", "1s"),
        ("S7WLWord", "S7AreaDB", s"DB$p.DBW4", s"plc${p}_count", "True", "10s"),
        ("S7WLDWord", "S7AreaMK", "MD2", s"plc${p}_total", "True", "min"),
        ("S7WLBit", "S7AreaPE", "I0.3", s"plc${p}_mode", "False", "60s"),
      ).map { case (t, ar, ad, al, ac, iv) =>
        s"<data><data_type>$t</data_type><area>$ar</area><address>$ad</address>" +
          s"<alias>$al</alias><active>$ac</active><interval>$iv</interval></data>"
      }.mkString
      s"""<plc slot="$p">10.0.0.$p$tags</plc>"""
    }.mkString
    s"<communication>$plcs</communication>"
  }

  val all: Seq[GraftQuery] = Seq(

    GraftQuery(
      "q_config_scan",
      "S1: XML tag-catalog scan → typed Dataset (ref create_my_data_groups, InfluxConnector2.py:250-270)",
      // The catalog XML is deterministic, so the oracle is the expected
      // parse result itself — this checks the DOM scan end-to-end (field
      // positions, slot attribute, bool coercion, active filter, ordering).
      """SELECT * FROM (VALUES
        |  ('10.0.0.1', 1, 'S7WLWord',  'S7AreaDB', 'DB1.DBW4', 'plc1_count', TRUE, '10s'),
        |  ('10.0.0.1', 1, 'S7WLReal',  'S7AreaDB', 'DB1.DBD0', 'plc1_temp',  TRUE, '1s'),
        |  ('10.0.0.1', 1, 'S7WLDWord', 'S7AreaMK', 'MD2',      'plc1_total', TRUE, 'min'),
        |  ('10.0.0.2', 2, 'S7WLWord',  'S7AreaDB', 'DB2.DBW4', 'plc2_count', TRUE, '10s'),
        |  ('10.0.0.2', 2, 'S7WLReal',  'S7AreaDB', 'DB2.DBD0', 'plc2_temp',  TRUE, '1s'),
        |  ('10.0.0.2', 2, 'S7WLDWord', 'S7AreaMK', 'MD2',      'plc2_total', TRUE, 'min'),
        |  ('10.0.0.3', 3, 'S7WLWord',  'S7AreaDB', 'DB3.DBW4', 'plc3_count', TRUE, '10s'),
        |  ('10.0.0.3', 3, 'S7WLReal',  'S7AreaDB', 'DB3.DBD0', 'plc3_temp',  TRUE, '1s'),
        |  ('10.0.0.3', 3, 'S7WLDWord', 'S7AreaMK', 'MD2',      'plc3_total', TRUE, 'min')
        |) AS t(plc, slot, "dataType", area, address, alias, active, interval)
        |ORDER BY plc, alias""".stripMargin) { (s, dir) =>
      ConfigXml.load(s, SampleConfigXml)
        .filter(col("active"))   // P1 at load time, like the reference (:263-264)
        .orderBy("plc", "alias")
        .toDF()
    },

    GraftQuery(
      "q_config_update",
      "S1: batch catalog UPDATE — last-write-wins per alias, applied to ALL rows matching the alias (ref update_element, ConfigApp.py:155-176)",
      // update_element mutates EVERY <data> whose alias matches, and a
      // sequence of updates leaves the last one's values. Batch analogue:
      // catalog = orders keyed by o_orderstatus (non-unique alias → the
      // update-all-matching behavior is observable), updates = lineitem
      // rows keyed by l_linestatus, update sequence = (shipdate, orderkey,
      // linenumber). Rows with an alias no update touches keep their value.
      """WITH upd AS (
        |  SELECT l_linestatus AS alias, l_extendedprice AS new_value,
        |         row_number() OVER (PARTITION BY l_linestatus
        |                            ORDER BY l_shipdate DESC, l_orderkey DESC, l_linenumber DESC) AS rn
        |  FROM lineitem)
        |SELECT o_orderkey, o_orderstatus AS alias,
        |       round(coalesce(u.new_value, o_totalprice), 2) AS value,
        |       CAST(CASE WHEN u.new_value IS NULL THEN 0 ELSE 1 END AS BIGINT) AS updated
        |FROM orders o
        |LEFT JOIN (SELECT alias, new_value FROM upd WHERE rn = 1) u
        |       ON o.o_orderstatus = u.alias
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      // Last write per alias via max(struct(seq..., payload)) — partial-agg
      // (map-side combine) instead of the oracle's window sort: no
      // single-reducer skew when one alias dominates a 100 TB update log.
      val lastUpd = lineitem(s, dir)
        .groupBy(col("l_linestatus").as("alias"))
        .agg(max(struct(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"))).as("w"))
        .select(col("alias"), col("w.l_extendedprice").as("new_value"))
      orders(s, dir)
        .join(broadcast(lastUpd), col("o_orderstatus") === col("alias"), "left")
        .select(col("o_orderkey"), col("o_orderstatus").as("alias"),
          round(coalesce(col("new_value"), col("o_totalprice")), 2).as("value"),
          when(col("new_value").isNull, 0L).otherwise(1L).as("updated"))
        .orderBy("o_orderkey")
    },

    GraftQuery(
      "q_decode_s7",
      "D3: native DecodeS7 Catalyst expression round-trip (codegen'd, ref InfluxConnector2.py:146-170)",
      """SELECT event_id,
        |       CAST((event_id % 65536) - 32768 AS BIGINT) AS w_val,
        |       CAST(CAST(value AS FLOAT) AS DOUBLE) AS r_val,
        |       (user_id >> (event_id % 8)) & 1 AS b_val,
        |       event_id AS d_val
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      DecodeS7.register(s)
      // Buffer synthesis (encode) is test scaffolding via small UDFs; the
      // decode path under test is the native expression.
      val encWord = udf((id: Long) => S7.encodeWord(((id % 65536) - 32768).toShort))
      val encReal = udf((v: Double) => S7.encodeReal(v.toFloat))
      val encBits = udf((u: Long) => S7.encodeBits(u.toInt))
      val encDWord = udf((id: Long) => S7.encodeDWord(id))
      events(s, dir)
        .withColumn("wbuf", encWord(col("event_id")))
        .withColumn("rbuf", encReal(col("value")))
        .withColumn("bbuf", encBits(col("user_id")))
        .withColumn("dbuf", encDWord(col("event_id")))
        .select(col("event_id"),
          expr(s"decode_s7(wbuf, ${S7.WLWord}, 0)").cast("bigint").as("w_val"),
          expr(s"decode_s7(rbuf, ${S7.WLReal}, 0)").as("r_val"),
          expr(s"decode_s7(bbuf, ${S7.WLBit}, CAST(event_id % 8 AS INT))").cast("bigint").as("b_val"),
          expr(s"decode_s7(dbuf, ${S7.WLDWord}, 0)").cast("bigint").as("d_val"))
        .orderBy("event_id")
    },

    GraftQuery(
      "q_ema",
      "D4: order-sensitive EMA per series via a typed Aggregator (forecasting surface, README.md:3)",
      // Closed form of the recurrence ema_i = a*v_i + (1-a)*ema_(i-1),
      // ema_1 = v_1: ema_n = (1-a)^(n-1)*v_1 + sum_{i>=2} a*(1-a)^(n-i)*v_i.
      // FP drift vs the fold is O(n*eps) ~ 1e-12 — far inside round(6).
      """WITH o AS (
        |  SELECT user_id, value,
        |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
        |         count(*)     OVER (PARTITION BY user_id) AS n
        |  FROM events)
        |SELECT user_id,
        |       round(sum(CASE WHEN rn = 1 THEN power(0.7, n - 1) * value
        |                      ELSE 0.3 * power(0.7, n - rn) * value END), 6) AS ema
        |FROM o GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val ds = events(s, dir)
        .select(col("user_id"), unix_micros(col("ts")).as("tsu"), col("event_id"), col("value"))
        .as[(Long, Long, Long, Double)]
      ds.groupByKey(_._1)
        .agg(new EmaAggregator(0.3).toColumn.name("ema"))
        .toDF("user_id", "ema")
        .select(col("user_id"), round(col("ema"), 6).as("ema"))
        .orderBy("user_id")
    },

    GraftQuery(
      "q_multimodal_meta",
      "Extension: multimodal binary-column plumbing — typed mapPartitions 'decode' over opaque bytes",
      """SELECT doc_id, octet_length(encode(text)) AS byte_len,
        |       64 + octet_length(encode(text)) % 1217 AS width,
        |       64 + (octet_length(encode(text)) * 31) % 929 AS height,
        |       octet_length(encode(text)) // 1024 + 1 AS frames
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      // Real multimodal plumbing: an opaque binary column flows through a
      // typed per-partition batch "decoder". The decode itself is a
      // deterministic stand-in (no image/audio libs in this container) —
      // swap `fakeDecode` for a real codec; schema/partitioning/batching
      // stay identical.
      def fakeDecode(id: Long, bytes: Array[Byte]): (Long, Long, Long, Long, Long) = {
        val len = bytes.length.toLong
        (id, len, 64 + len % 1217, 64 + (len * 31) % 929, len / 1024 + 1)
      }
      Q.fanout(documents(s, dir))
        .select(col("doc_id"), col("text").cast("binary").as("media"))
        .as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, bytes) => fakeDecode(id, bytes) })
        .toDF("doc_id", "byte_len", "width", "height", "frames")
        .orderBy("doc_id")
    },

    GraftQuery(
      "q_multimodal_frames",
      "Extension: frame-sampling plumbing — explode one row per 64-byte 'frame' of an opaque media column, per-frame feature",
      """SELECT doc_id, frame_idx,
        |       unicode(substr(text, frame_idx * 64 + 1, 1)) AS first_byte,
        |       octet_length(encode(substr(text, frame_idx * 64 + 1, 64))) AS frame_len
        |FROM (SELECT doc_id, text,
        |             unnest(range((octet_length(encode(text)) + 63) // 64)) AS frame_idx
        |      FROM documents)
        |ORDER BY doc_id, frame_idx""".stripMargin) { (s, dir) =>
      // The real-codec version swaps the substr "decode" for an image/video
      // frame grab inside the same shape: sequence+explode fans one row per
      // frame out ON THE EXECUTORS (output-proportional, no driver loop),
      // and downstream per-frame features are ordinary columns. Row count
      // = total frames, so a 100 TB corpus fans out in parallel with no
      // skew beyond document length itself. (Division by 64 — a power of
      // two — is exact in binary FP, so the cast truncation equals the
      // oracle's integer division.)
      Q.fanout(documents(s, dir))
        .select(col("doc_id"), col("text"),
          explode(expr("sequence(0, CAST((length(text) + 63) / 64 AS INT) - 1)")).as("frame_idx"))
        .select(col("doc_id"), col("frame_idx").cast("bigint").as("frame_idx"),
          ascii(expr("substr(text, frame_idx * 64 + 1, 1)")).cast("bigint").as("first_byte"),
          length(expr("substr(text, frame_idx * 64 + 1, 64)")).cast("bigint").as("frame_len"))
        .orderBy("doc_id", "frame_idx")
    },

    GraftQuery(
      "q_line_protocol",
      "S3: line-protocol point shaping (batched sink formatting, fixes per-sample POST of InfluxConnector2.py:176)",
      """SELECT event_id,
        |       'plc-' || user_id || ' ' || event_type || '=' || printf('%.2f', value)
        |         || ' ' || (epoch_us(ts) * 1000) AS line
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      LineProtocol.format(events(s, dir)).orderBy("event_id")
    },

    GraftQuery(
      "q_line_protocol_parse",
      "S3 inverse: parse line-protocol text back to points (wire-format round trip; the read side of InfluxConnector2.py:175-176)",
      // The oracle recomputes what parse(format(events)) must yield
      // straight from the source table — field values compared as the
      // exact wire text (printf twin of the sink's %.2f, proven by
      // q_line_protocol), so no parse-then-recast float asymmetry.
      """SELECT event_id, 'plc-' || user_id AS measurement, event_type AS field,
        |       printf('%.2f', value) AS value_str, epoch_us(ts) * 1000 AS ts_ns
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      val parsed = LineProtocol.parseLines(LineProtocol.format(events(s, dir)))
      // Single-field lines: read the one entry via map_keys/map_values
      // instead of explode — generating into the parse projection hit a
      // pathological ~20s whole-stage-codegen COMPILE (runtime was fine);
      // the scalar form compiles instantly and stays codegen'd.
      parsed
        .select(col("event_id"), col("measurement"),
          element_at(map_keys(col("fields_str")), 1).as("field"),
          element_at(map_values(col("fields_str")), 1).as("value_str"),
          col("ts_ns"))
        .orderBy("event_id")
    },
  )
}

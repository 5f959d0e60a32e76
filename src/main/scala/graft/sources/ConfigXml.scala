package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}
import org.w3c.dom.Element

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets
import javax.xml.parsers.DocumentBuilderFactory

/** One tag (sensor address) of the PLC tag catalog — the reference's
  * `my_data` row (Linux/InfluxConnector2.py:33-54).
  */
case class TagConfig(
    plc: String,
    slot: Int,
    dataType: String,
    area: String,
    address: String,
    alias: String,
    active: Boolean,
    interval: String)

/** XML tag-catalog scan (SURVEY.md §2.1 S1) — the reference's
  * `create_my_data_groups` config read (Linux/InfluxConnector2.py:250-270,
  * schema written by ConfigApp/ConfigApp.py:54-84):
  *
  *   <communication>
  *     <plc slot="1">10.0.0.1
  *       <data><data_type>…</data_type><area>…</area><address>…</address>
  *             <alias>…</alias><active>…</active><interval>…</interval></data>
  *     </plc>
  *   </communication>
  *
  * Children are read positionally (data[0..5] — InfluxConnector2.py:261)
  * to replicate observable reference behavior; coercion is typed casts,
  * never the reference's eval() (InfluxConnector2.py:47-51). The catalog
  * is a small dimension — parsed on the driver via JDK DOM (scala-xml is
  * not on the offline classpath) and broadcast for enrichment joins.
  */
object ConfigXml {

  def parseString(xml: String): Seq[TagConfig] = {
    val dbf = DocumentBuilderFactory.newInstance()
    // No DTDs/entities in the catalog format; disable for safety.
    dbf.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    val doc = dbf.newDocumentBuilder()
      .parse(new ByteArrayInputStream(xml.getBytes(StandardCharsets.UTF_8)))
    val plcs = doc.getDocumentElement.getChildNodes
    (0 until plcs.getLength).map(plcs.item).collect {
      case plc: Element if plc.getTagName == "plc" =>
        // The PLC IP is the element's own text (mixed content before <data>).
        val ip = firstText(plc)
        val slot = Option(plc.getAttribute("slot")).filter(_.nonEmpty).getOrElse("1").trim.toInt
        val datas = plc.getChildNodes
        (0 until datas.getLength).map(datas.item).collect {
          case d: Element if d.getTagName == "data" =>
            val kids = d.getChildNodes
            val fields = (0 until kids.getLength).map(kids.item).collect {
              case e: Element => e.getTextContent.trim
            }
            // Positional schema: type, area, address, alias, active, interval
            // (InfluxConnector2.py:261). Missing interval (Windows variant,
            // Windows/InfluxConnector2.py:35-43) defaults to 'min'.
            TagConfig(ip, slot, fields(0), fields(1), fields(2), fields(3),
              parseBool(fields(4)), if (fields.length > 5) fields(5) else "min")
        }
    }.flatten
  }

  def parseFile(path: String): Seq[TagConfig] =
    parseString(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      StandardCharsets.UTF_8))

  /** Load the catalog as a typed Dataset — a broadcastable dimension. */
  def load(spark: SparkSession, xml: String): Dataset[TagConfig] = {
    import spark.implicits._
    spark.createDataset(parseString(xml))
  }

  private def firstText(e: Element): String = {
    val kids = e.getChildNodes
    (0 until kids.getLength).map(kids.item)
      .collectFirst { case t if t.getNodeType == org.w3c.dom.Node.TEXT_NODE && t.getTextContent.trim.nonEmpty =>
        t.getTextContent.trim }
      .getOrElse("")
  }

  private def parseBool(s: String): Boolean = s.trim.equalsIgnoreCase("true")
}

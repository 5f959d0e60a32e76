package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.QCustom

/** XML tag-catalog parsing — the positional reference schema
  * (Linux/InfluxConnector2.py:261, address forms README.md:45-51).
  */
class ConfigXmlSpec extends AnyFunSuite {

  private val xml =
    """<communication>
      |  <plc slot="2">192.168.0.5
      |    <data><data_type>S7WLReal</data_type><area>S7AreaDB</area><address>DB10.DBD0</address><alias>temp</alias><active>True</active><interval>1s</interval></data>
      |    <data><data_type>S7WLBit</data_type><area>S7AreaPE</area><address>I0.3</address><alias>switch</alias><active>False</active><interval>min</interval></data>
      |  </plc>
      |  <plc>10.1.1.1
      |    <data><data_type>S7WLWord</data_type><area>S7AreaMK</area><address>MW2</address><alias>mode</alias><active>True</active></data>
      |  </plc>
      |</communication>""".stripMargin

  test("parses PLC ip (mixed content), slot attribute, positional fields") {
    val tags = ConfigXml.parseString(xml)
    assert(tags.size === 3)
    val temp = tags.find(_.alias == "temp").get
    assert(temp.plc === "192.168.0.5")
    assert(temp.slot === 2)
    assert(temp.dataType === "S7WLReal")
    assert(temp.area === "S7AreaDB")
    assert(temp.address === "DB10.DBD0")
    assert(temp.active)
    assert(temp.interval === "1s")
  }

  test("missing slot defaults to 1; missing interval defaults to 'min' (Windows variant)") {
    val mode = ConfigXml.parseString(xml).find(_.alias == "mode").get
    assert(mode.slot === 1)
    assert(mode.interval === "min")
  }

  test("active coercion is typed, not eval(): only 'True' is active") {
    val tags = ConfigXml.parseString(xml)
    assert(tags.count(_.active) === 2)
    assert(!tags.find(_.alias == "switch").get.active)
  }

  test("the sample catalog used by q_config_scan parses to 12 tags, 9 active") {
    val tags = ConfigXml.parseString(QCustom.SampleConfigXml)
    assert(tags.size === 12)
    assert(tags.count(_.active) === 9)
    assert(tags.map(_.plc).distinct.sorted === Seq("10.0.0.1", "10.0.0.2", "10.0.0.3"))
  }
}

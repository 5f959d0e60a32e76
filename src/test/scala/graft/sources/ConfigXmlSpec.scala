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

  test("render/parse round-trips any catalog, including XML-hostile text") {
    val tags = Seq(
      TagConfig("10.0.0.1", 1, "S7WLReal", "S7AreaDB", "DB1.DBD0", "temp", active = true, "1s"),
      TagConfig("10.0.0.1", 1, "S7WLBit", "S7AreaPE", "I0.0", "a<b&c", active = false, "min"),
      TagConfig("10.0.0.2", 2, "S7WLWord", "S7AreaMK", "MW10", "rpm", active = true, "10s"))
    assert(ConfigXml.parseString(ConfigXml.render(tags)) == tags)
  }

  test("headless ConfigApp lifecycle: add -> list -> update -> delete (the GUI's exact flow)") {
    val path = java.nio.file.Files.createTempDirectory("cfgxml").resolve("config.xml").toString
    val t1 = TagConfig("10.0.0.9", 1, "S7WLReal", "S7AreaDB", "DB1.DBD0", "temp", active = true, "1s")
    val t2 = TagConfig("10.0.0.9", 1, "S7WLWord", "S7AreaMK", "MW10", "rpm", active = true, "10s")
    val t3 = TagConfig("10.0.0.7", 1, "S7WLBit", "S7AreaPE", "I0.0", "door", active = false, "min")
    // update_config: creates the file, then appends under the existing plc
    ConfigXml.addTag(path, t1)
    ConfigXml.addTag(path, t2)
    ConfigXml.addTag(path, t3)
    assert(ConfigXml.parseFile(path) == Seq(t1, t2, t3))
    assert(ConfigXml.listPlcs(path) == Seq("10.0.0.9", "10.0.0.7"))
    assert(ConfigXml.listAliases(path, "10.0.0.9") == Seq("temp", "rpm"))
    // update_element: rewrite by (plc, alias) in place
    val t2b = t2.copy(interval = "60s", active = false)
    ConfigXml.updateTag(path, "10.0.0.9", "rpm", t2b)
    assert(ConfigXml.parseFile(path) == Seq(t1, t2b, t3))
    // delete_element: drop by (plc, alias); an emptied plc group vanishes
    ConfigXml.deleteTag(path, "10.0.0.7", "door")
    assert(ConfigXml.parseFile(path) == Seq(t1, t2b))
    assert(ConfigXml.listPlcs(path) == Seq("10.0.0.9"))
    // and the authored file reads back through the daemon-side parser
    assert(ConfigXml.parseFile(path) == Seq(t1, t2b))
  }
}

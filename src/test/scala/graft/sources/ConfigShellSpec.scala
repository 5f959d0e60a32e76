package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Scripts a full GUI session through the headless shell — every button of
  * the reference ConfigApp (add / find aliases / find data / update /
  * delete / show raw / exit) exercised line-by-line against a real file,
  * with the bad-input resilience a GUI event loop has (errors report and
  * the loop continues).
  */
class ConfigShellSpec extends AnyFunSuite {

  private def session(cmds: String*): (Seq[String], String) = {
    val f = java.io.File.createTempFile("cfgshell", ".xml")
    f.deleteOnExit()
    java.nio.file.Files.writeString(f.toPath,
      "<communication></communication>")
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    ConfigShell.repl(f.getPath, cmds.iterator, out += _)
    (out.toSeq, f.getPath)
  }

  test("a scripted session: add → list → show → update → delete → raw") {
    val (out, _) = session(
      "add 10.0.0.1 2 S7WLReal S7AreaDB DB10.DBD0 temp true 1s",
      "add 10.0.0.1 2 S7WLBit S7AreaPE I0.3 switch false min",
      "add 10.0.0.2 1 S7WLWord S7AreaMK MW2 mode true h",
      "plcs",
      "aliases 10.0.0.1",
      "show 10.0.0.1 temp",
      "update 10.0.0.1 temp S7WLReal S7AreaDB DB10.DBD4 temp2 false min",
      "show 10.0.0.1 temp2",
      "delete 10.0.0.1 switch",
      "aliases 10.0.0.1",
      "raw",
      "exit",
      "plcs" // after exit: must not run
    )
    assert(out.take(3) === Seq("ok", "ok", "ok"))
    assert(out.slice(3, 5) === Seq("10.0.0.1", "10.0.0.2"))
    assert(out.slice(5, 7) === Seq("temp", "switch"))
    assert(out(7) === "S7WLReal S7AreaDB DB10.DBD0 temp true 1s")
    assert(out(8) === "ok")
    assert(out(9) === "S7WLReal S7AreaDB DB10.DBD4 temp2 false min")
    assert(out(10) === "ok")
    assert(out(11) === "temp2")
    assert(out(12).contains("<communication>") && out(12).contains("DB10.DBD4"))
    assert(out.length === 13, s"commands after exit must not execute: $out")
  }

  test("bad input reports and the loop continues (GUI resilience)") {
    val (out, _) = session(
      "add 10.0.0.1 notanint S7WLReal S7AreaDB DB1 t true 1s", // bad slot
      "frobnicate",                                            // unknown
      "show 10.0.0.9 nope",                                    // missing
      "add 10.0.0.1 2 S7WLReal S7AreaDB DB1 t true 1s",        // still works
      "aliases 10.0.0.1")
    assert(out(0).startsWith("error:"))
    assert(out(1).startsWith("unknown command:"))
    assert(out(2).startsWith("not found:"))
    assert(out(3) === "ok" && out(4) === "t")
  }
}

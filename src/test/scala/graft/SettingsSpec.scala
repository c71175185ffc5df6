package graft

import org.scalatest.funsuite.AnyFunSuite

/** Persisted CLI configuration (reference: cli.py:41-64 config verb).
  * GRAFT_USER_DIR cannot be faked per-test (env is fixed at JVM start),
  * so these tests exercise the file round-trip through a scratch dir by
  * pointing the process env there in CI — or, here, by asserting the
  * pure pieces and writing through the real API against the resolved
  * user dir only when it is already a temp location. */
class SettingsSpec extends AnyFunSuite {

  test("set + load round-trip merges keys") {
    // run against the real (env-resolved) user dir; restore state after
    val before = Settings.load()
    try {
      Settings.set(root = Some("/tmp/graft_root_a"))
      Settings.set(exportDir = Some("/tmp/graft_exp_b"))
      val m = Settings.load()
      assert(m("root") == "/tmp/graft_root_a")       // survived second set
      assert(m("export_dir") == "/tmp/graft_exp_b")
      assert(Settings.defaultRoot == "/tmp/graft_root_a")
      assert(Settings.defaultExportDir == "/tmp/graft_exp_b")
      assert(Settings.showCurrent().contains("/tmp/graft_root_a"))
    } finally {
      // restore the pre-test values (or harmless defaults)
      Settings.set(
        root = Some(before.getOrElse("root", Settings.userDir + "/store")),
        exportDir = Some(before.getOrElse("export_dir", Settings.userDir + "/exports")))
    }
  }

  test("quotes and backslashes in paths survive the JSON round-trip") {
    val before = Settings.load()
    try {
      Settings.set(root = Some("""/tmp/we"ird\path"""))
      assert(Settings.load()("root") == """/tmp/we"ird\path""")
    } finally Settings.set(
      root = Some(before.getOrElse("root", Settings.userDir + "/store")))
  }
}

package graft

import graft.pipeline.CliConfig
import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference's only unit tests (config_test.go:35-77):
  * defaults, env-over-defaults, CLI-over-env. */
class CliConfigSpec extends AnyFunSuite {

  test("defaults resolve when nothing else is set") {
    val r = CliConfig.resolve(Map.empty, Map.empty)
    assert(r("wait") == "600")
    assert(r("limit") == "10000")
    assert(r("chunk-size") == "10000")
  }

  test("environment overrides defaults") {
    val r = CliConfig.resolve(Map.empty,
      Map("GRAFT_WAIT" -> "60", "GRAFT_CHUNK_SIZE" -> "500"))
    assert(r("wait") == "60")
    assert(r("chunk-size") == "500")
    assert(r("limit") == "10000") // untouched default survives
  }

  test("CLI flags override environment") {
    val r = CliConfig.resolve(Map("wait" -> "5"),
      Map("GRAFT_WAIT" -> "60"))
    assert(r("wait") == "5")
  }

  test("env supplies keys with no default (source, url)") {
    val r = CliConfig.resolve(Map.empty, Map("GRAFT_URL" -> "http://x"))
    assert(r("url") == "http://x")
  }

  test("hide-inactive-fields: defaults false (config.go:25), env and CLI override") {
    assert(CliConfig.resolve(Map.empty, Map.empty)("hide-inactive-fields")
      == "false")
    assert(CliConfig.resolve(Map.empty,
      Map("GRAFT_HIDE_INACTIVE_FIELDS" -> "true"))("hide-inactive-fields")
      == "true")
    assert(CliConfig.resolve(Map("hide-inactive-fields" -> "false"),
      Map("GRAFT_HIDE_INACTIVE_FIELDS" -> "true"))("hide-inactive-fields")
      == "false")
  }
}

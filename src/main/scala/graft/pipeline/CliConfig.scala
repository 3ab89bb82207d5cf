package graft.pipeline

/** Config resolution with the reference's precedence: defaults <
  * environment < CLI flags (config.go resolves EXECUTESYNC_* env over
  * defaults with flags last; its only unit tests, config_test.go:35-77,
  * pin exactly this ordering). Env names follow the same convention:
  * `GRAFT_<KEY>` with dashes as underscores (chunk-size →
  * GRAFT_CHUNK_SIZE). */
object CliConfig {

  /** Reference defaults: Wait=600 (config.go:22), MaxDocuments=10000
    * (config.go:18), ChunkSize=10000 (config.go:23). */
  val defaults: Map[String, String] = Map(
    "wait" -> "600",
    "limit" -> "10000",
    "chunk-size" -> "10000",
    "state" -> ".",
    "target-file-mb" -> "128",
    // HideInactiveFields default:"false" (config.go:25)
    "hide-inactive-fields" -> "false")

  private val knownKeys = defaults.keySet ++
    Set("source", "landing", "url", "user", "password", "schema", "calcs")

  def envKey(k: String): String = "GRAFT_" + k.toUpperCase.replace('-', '_')

  def resolve(cli: Map[String, String],
      env: Map[String, String] = sys.env): Map[String, String] = {
    val fromEnv = (knownKeys ++ cli.keySet).flatMap { k =>
      env.get(envKey(k)).map(k -> _)
    }.toMap
    defaults ++ fromEnv ++ cli
  }
}

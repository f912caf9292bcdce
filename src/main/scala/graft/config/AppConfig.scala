package graft.config

/** Environment-mode configuration (≙ reference config/AppConfig.scala:16-84:
  * priority CLI args > system properties > environment defaults, with ${VAR}
  * substitution and per-env validation — reference
  * validation/EnvironmentValidator.scala:27-79).
  *
  * The reference's env ladder (local/dev/staging/prod — main.scala:241-338)
  * maps to parallelism + checkpoint-interval + trigger defaults here.
  */
final case class AppConfig(
    env: String = "local",
    parallelism: Int = Runtime.getRuntime.availableProcessors(),
    checkpointIntervalSec: Int = 30,
    maxFilesPerTrigger: Int = 48,
    tableDir: String = "",
    workDir: String = "",
    sessionGap: String = "30 minutes",
    joinHorizon: String = "10 minutes",
    watermark: String = "30 seconds"
) {
  /** ≙ reference AppConfig.validateConfiguration (AppConfig.scala:259-273). */
  def validate(): Either[String, AppConfig] = {
    if (!AppConfig.Envs.contains(env)) Left(s"unknown env '$env' (${AppConfig.Envs.mkString("/")})")
    else if (parallelism < 1) Left("parallelism must be >= 1")
    else if (checkpointIntervalSec < 1) Left("checkpoint interval must be >= 1s")
    else if (maxFilesPerTrigger < 1) Left("maxFilesPerTrigger must be >= 1")
    else Right(this)
  }
}

object AppConfig {

  val Envs = Set("local", "dev", "staging", "prod")

  /** Per-env defaults (≙ reference main.scala:247,267,287,311 parallelism
    * 1/1/2/2 and checkpoint 30/45/60/60 s — recast for this runtime).
    */
  private val envDefaults = Map(
    "local" -> (8, 30),
    "dev" -> (8, 45),
    "staging" -> (16, 60),
    "prod" -> (32, 60)
  )

  /** ${VAR} substitution from the environment (≙ AppConfig.scala:103-109). */
  def substitute(v: String, getenv: String => Option[String] = sys.env.get): String =
    "\\$\\{([A-Za-z_][A-Za-z0-9_]*)\\}".r.replaceAllIn(v, m =>
      scala.util.matching.Regex.quoteReplacement(getenv(m.group(1)).getOrElse("")))

  /** Load with the reference's priority: defaults < env-mode < system
    * properties < CLI `key=value` args.
    */
  def load(args: Seq[String], props: Map[String, String] = sys.props.toMap): Either[String, AppConfig] = {
    val cli = args.filter(_.contains("=")).map { a =>
      val Array(k, v) = a.split("=", 2); k -> substitute(v)
    }.toMap
    def get(k: String): Option[String] = cli.get(k).orElse(props.get(s"graft.$k"))
    val env = get("env").getOrElse("local")
    val (defPar, defCk) = envDefaults.getOrElse(env, (8, 30))
    val cfg = AppConfig(
      env = env,
      parallelism = get("parallelism").map(_.toInt).getOrElse(defPar),
      checkpointIntervalSec = get("checkpointIntervalSec").map(_.toInt).getOrElse(defCk),
      maxFilesPerTrigger = get("maxFilesPerTrigger").map(_.toInt).getOrElse(48),
      tableDir = get("tableDir").getOrElse(""),
      workDir = get("workDir").getOrElse(""),
      sessionGap = get("sessionGap").getOrElse("30 minutes"),
      joinHorizon = get("joinHorizon").getOrElse("10 minutes"),
      watermark = get("watermark").getOrElse("30 seconds")
    )
    cfg.validate()
  }
}

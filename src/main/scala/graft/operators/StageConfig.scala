package graft.operators

import org.apache.spark.sql.SparkSession

/** Declarative stage configuration for the masking dataflow — the O7 surface
  * (reference `MaskDataTransform.instantiate`, MaskDataTransform.scala:47-85):
  * fixed key set with unknown-key rejection, per-field validation with ERROR
  * ACCUMULATION (all problems reported at once, not fail-fast), and a typed
  * stage value on success.
  *
  * The reference reads HOCON through the host framework; the engine core
  * accepts HOCON directly ([[Hocon]] — so a reference user's existing
  * `.conf` files with comments, unquoted keys and substitutions migrate
  * unchanged), strict JSON (parsed with Spark's bundled json4s), or an
  * already-parsed map — the validation contract is the same on every path.
  */
object StageConfig {

  case class MaskStage(
      name: String,
      description: Option[String],
      environments: Seq[String],
      inputView: String,
      outputView: String,
      persist: Boolean,
      params: Map[String, String])

  val ExpectedKeys: Set[String] =
    Set("type", "name", "description", "environments", "inputView", "outputView", "persist", "params")

  /** Parse a HOCON (or JSON — HOCON is a superset) stage document with the
    * same accumulating validation as [[parse]]. */
  def parseHocon(conf: String): Either[List[String], MaskStage] =
    Hocon.parse(conf).flatMap(parse)

  /** Load a `.conf` FILE: `include` directives resolve relative to the
    * file (then classpath), the Typesafe-Config behavior reference users
    * migrate from. The string entry points stay include-free by design. */
  def parseHoconFile(path: String): Either[List[String], MaskStage] =
    Hocon.parseFile(path).flatMap(parse)

  def parseJson(json: String): Either[List[String], MaskStage] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods

    // mixed-type arrays/objects must survive the conversion so the typed
    // validators can REJECT them ('environments': [123] has to reach
    // environmentsList as Seq(123L), not be silently filtered to Nil)
    def toAny(v: JValue): Any = v match {
      case JString(s) => s
      case JBool(b) => b
      case JObject(o) => o.map { case (k, pv) => k -> toAny(pv) }.toMap
      case JArray(a) => a.map(toAny)
      case JNull => null
      case other => other.values
    }

    JsonMethods.parseOpt(json) match {
      case Some(JObject(fields)) =>
        parse(fields.map { case (k, v) => k -> toAny(v) }.toMap)
      case _ => Left(List("stage config must be a JSON object"))
    }
  }

  /** Validate a parsed config map. Accumulates every error. */
  def parse(config: Map[String, Any]): Either[List[String], MaskStage] = {
    val unknown = config.keySet.diff(ExpectedKeys).toList.sorted
      .map(k => s"Unknown option '$k'.")

    def requiredString(key: String): Either[String, String] = config.get(key) match {
      case Some(s: String) if s.nonEmpty => Right(s)
      case Some(_) => Left(s"'$key' must be a non-empty string.")
      case None => Left(s"Missing required attribute '$key'.")
    }
    def optionalString(key: String): Either[String, Option[String]] = config.get(key) match {
      case Some(s: String) => Right(Some(s))
      case Some(_) => Left(s"'$key' must be a string.")
      case None => Right(None)
    }
    def optionalBool(key: String, default: Boolean): Either[String, Boolean] = config.get(key) match {
      case Some(b: Boolean) => Right(b)
      case Some(s: String) if s == "true" || s == "false" => Right(s.toBoolean)
      case Some(_) => Left(s"'$key' must be a boolean.")
      case None => Right(default)
    }
    def paramsMap: Either[String, Map[String, String]] = {
      // HOCON types unquoted scalars (days = 14 -> Long); coerce scalars to
      // strings like typesafe-config's getString so reference-style .conf
      // files migrate unchanged — only nested objects/arrays/nulls reject
      def scalar(v: Any): Boolean = v match {
        case _: String | _: Boolean | _: Long | _: Int | _: Double => true
        case _: BigInt | _: BigDecimal => true // json4s types JSON numbers this way
        case _ => false
      }
      config.get("params") match {
        case Some(m: Map[_, _]) if m.values.forall(scalar) =>
          Right(m.map { case (k, v) => k.toString -> v.toString })
        case Some(_) => Left("'params' must be an object of scalar values.")
        case None => Right(Map.empty)
      }
    }
    def environmentsList: Either[String, Seq[String]] = config.get("environments") match {
      case Some(xs: Seq[_]) if xs.forall(_.isInstanceOf[String]) => Right(xs.map(_.toString))
      case Some(_) => Left("'environments' must be an array of strings.")
      case None => Right(Nil)
    }

    val name = requiredString("name")
    val description = optionalString("description")
    val environments = environmentsList
    val inputView = requiredString("inputView")
    val outputView = requiredString("outputView")
    val persist = optionalBool("persist", default = false)
    val params = paramsMap

    val errors = unknown ++
      List(name, description, environments, inputView, outputView, persist, params)
        .collect { case Left(e) => e }

    if (errors.nonEmpty) Left(errors)
    else Right(MaskStage(
      name.toOption.get, description.toOption.get, environments.toOption.get,
      inputView.toOption.get, outputView.toOption.get, persist.toOption.get, params.toOption.get))
  }

  /** Parse (HOCON or JSON), validate, and execute against a session in one
    * step. */
  def run(spark: SparkSession, conf: String): Either[List[String], org.apache.spark.sql.DataFrame] =
    parseHocon(conf).map { stage =>
      MaskTransform.runStage(spark, stage.inputView, stage.outputView, stage.persist)._1
    }

  /** Environment-gated execution — the host-dataflow semantics the
    * `environments` key exists for: a stage whose list does not contain the
    * ACTIVE environment is validated but SKIPPED, not an error (e.g. a
    * production-only masking stage under "test"). An empty list means run
    * everywhere. Returns Right(None) when skipped. */
  def runIfEnvironment(spark: SparkSession, conf: String,
                       activeEnvironment: String): Either[List[String], Option[org.apache.spark.sql.DataFrame]] =
    parseHocon(conf).map { stage =>
      if (stage.environments.nonEmpty && !stage.environments.contains(activeEnvironment)) None
      else Some(MaskTransform.runStage(spark, stage.inputView, stage.outputView, stage.persist)._1)
    }
}

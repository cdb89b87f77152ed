package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.MetadataBuilder
import org.apache.spark.storage.StorageLevel

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
  *
  * Beyond the single stage, [[runPipeline]] is the host-runner analog: the
  * reference's driver accepts a `{"stages": [...]}` document and walks the
  * stages in order, wiring dataflow through session-catalog view names
  * (reference MaskDataTransformSuite.scala:64-110 builds exactly that shape;
  * SURVEY §3 entry point A). Semantics preserved: ALL stages are validated
  * up front with stage-indexed error accumulation (an invalid stage 3 means
  * stage 0 never runs — no partial execution), each stage is environment-
  * gated individually, and execution is a driver-side sequential loop with
  * all data-parallelism inside Spark actions.
  */
object StageConfig {

  /** A validated pipeline stage. `MaskDataTransform` is the reference
    * plugin's own stage; the extract/metadata/sql/load types are the
    * minimal host-framework vocabulary its test pipelines depend on
    * (extract a source, attach mask treatments, transform, write). */
  sealed trait PipelineStage {
    def stageType: String
    def name: String
    def environments: Seq[String]
  }

  case class MaskStage(
      name: String,
      description: Option[String],
      environments: Seq[String],
      inputView: String,
      outputView: String,
      persist: Boolean,
      params: Map[String, String]) extends PipelineStage {
    def stageType: String = "MaskDataTransform"
  }

  /** ParquetExtract / DelimitedExtract: read `inputURI`, publish
    * `outputView`. `header` applies to the delimited flavor only;
    * `numPartitions` respreads a single-split source so a downstream
    * per-cell KDF stage is not pinned to one core. */
  case class ExtractStage(
      stageType: String,
      name: String,
      description: Option[String],
      environments: Seq[String],
      inputURI: String,
      outputView: String,
      persist: Boolean,
      header: Boolean,
      numPartitions: Option[Int]) extends PipelineStage

  /** MetadataTransform: attach a mask treatment (a `${value}` SQL template,
    * [[MaskTransform]]'s column contract) to each named column of
    * `inputView` — the standalone analog of the reference's schema-file
    * metadata path (its TypingTransform reads treatments from a schema
    * JSON; here they ship in the stage config itself). */
  case class MetadataStage(
      name: String,
      description: Option[String],
      environments: Seq[String],
      inputView: String,
      outputView: String,
      persist: Boolean,
      treatments: Map[String, String]) extends PipelineStage {
    def stageType: String = "MetadataTransform"
  }

  /** SQLTransform: run a SQL statement over the published views, publish
    * the result. `sqlParams` values substitute `${key}` placeholders in the
    * statement at execution time (the reference's SQLTransform contract). */
  case class SqlStage(
      name: String,
      description: Option[String],
      environments: Seq[String],
      sql: String,
      outputView: String,
      persist: Boolean,
      sqlParams: Map[String, String]) extends PipelineStage {
    def stageType: String = "SQLTransform"
  }

  /** ParquetLoad: write `inputView` to `outputURI` (overwrite). */
  case class LoadStage(
      name: String,
      description: Option[String],
      environments: Seq[String],
      inputView: String,
      outputURI: String,
      numPartitions: Option[Int]) extends PipelineStage {
    def stageType: String = "ParquetLoad"
  }

  val ExpectedKeys: Set[String] =
    Set("type", "name", "description", "environments", "inputView", "outputView", "persist", "params")

  private val ExpectedKeysByType: Map[String, Set[String]] = Map(
    "MaskDataTransform" -> ExpectedKeys,
    "ParquetExtract" -> Set("type", "name", "description", "environments", "inputURI", "outputView", "persist", "numPartitions"),
    "DelimitedExtract" -> Set("type", "name", "description", "environments", "inputURI", "outputView", "persist", "header", "numPartitions"),
    "MetadataTransform" -> Set("type", "name", "description", "environments", "inputView", "outputView", "persist", "treatments"),
    "SQLTransform" -> Set("type", "name", "description", "environments", "sql", "outputView", "persist", "sqlParams"),
    "ParquetLoad" -> Set("type", "name", "description", "environments", "inputView", "outputURI", "numPartitions"))

  // ---- field validators (shared by every stage parser; error strings are
  // part of the stage_config_errors oracle contract — do not reword) ----

  private def requiredString(config: Map[String, Any], key: String): Either[String, String] =
    config.get(key) match {
      case Some(s: String) if s.nonEmpty => Right(s)
      case Some(_) => Left(s"'$key' must be a non-empty string.")
      case None => Left(s"Missing required attribute '$key'.")
    }

  private def optionalString(config: Map[String, Any], key: String): Either[String, Option[String]] =
    config.get(key) match {
      case Some(s: String) => Right(Some(s))
      case Some(_) => Left(s"'$key' must be a string.")
      case None => Right(None)
    }

  private def optionalBool(config: Map[String, Any], key: String, default: Boolean): Either[String, Boolean] =
    config.get(key) match {
      case Some(b: Boolean) => Right(b)
      case Some(s: String) if s == "true" || s == "false" => Right(s.toBoolean)
      case Some(_) => Left(s"'$key' must be a boolean.")
      case None => Right(default)
    }

  private def optionalInt(config: Map[String, Any], key: String): Either[String, Option[Int]] =
    (config.get(key) match {
      case Some(i: Int) => Right(Some(i))
      case Some(l: Long) if l.isValidInt => Right(Some(l.toInt))
      case Some(b: BigInt) if b.isValidInt => Right(Some(b.toInt))
      // all-digit strings can still overflow Int (the Long/BigInt cases
      // guard with isValidInt; an unguarded toInt would escape as a raw
      // NumberFormatException, breaking the accumulated-errors contract)
      case Some(s: String) if s.forall(_.isDigit) && s.nonEmpty =>
        scala.util.Try(s.toInt).toOption match {
          case Some(i) => Right(Some(i))
          case None => Left(s"'$key' must be an integer.")
        }
      case Some(_) => Left(s"'$key' must be an integer.")
      case None => Right(None)
    }).flatMap {
      // validate-everything-up-front: a non-positive partition count would
      // otherwise fail MID-pipeline at repartition() after earlier stages
      // already ran and published views
      case Some(i) if i <= 0 => Left(s"'$key' must be a positive integer.")
      case ok => Right(ok)
    }

  /** HOCON types unquoted scalars (days = 14 -> Long); coerce scalars to
    * strings like typesafe-config's getString so reference-style .conf
    * files migrate unchanged — only nested objects/arrays/nulls reject. */
  private def stringMap(config: Map[String, Any], key: String): Either[String, Map[String, String]] = {
    def scalar(v: Any): Boolean = v match {
      case _: String | _: Boolean | _: Long | _: Int | _: Double => true
      case _: BigInt | _: BigDecimal => true // json4s types JSON numbers this way
      case _ => false
    }
    config.get(key) match {
      case Some(m: Map[_, _]) if m.values.forall(scalar) =>
        Right(m.map { case (k, v) => k.toString -> v.toString })
      case Some(_) => Left(s"'$key' must be an object of scalar values.")
      case None => Right(Map.empty)
    }
  }

  private def environmentsList(config: Map[String, Any]): Either[String, Seq[String]] =
    config.get("environments") match {
      case Some(xs: Seq[_]) if xs.forall(_.isInstanceOf[String]) => Right(xs.map(_.toString))
      case Some(_) => Left("'environments' must be an array of strings.")
      case None => Right(Nil)
    }

  private def unknownKeys(config: Map[String, Any], expected: Set[String]): List[String] =
    config.keySet.diff(expected).toList.sorted.map(k => s"Unknown option '$k'.")

  private def collect[A](parts: (Either[String, Any])*)(errors0: List[String])(build: => A): Either[List[String], A] = {
    val errors = errors0 ++ parts.collect { case Left(e) => e }
    if (errors.nonEmpty) Left(errors) else Right(build)
  }

  /** Parse a HOCON (or JSON — HOCON is a superset) stage document with the
    * same accumulating validation as [[parse]]. */
  def parseHocon(conf: String): Either[List[String], MaskStage] =
    Hocon.parse(conf).flatMap(parse)

  /** Load a `.conf` FILE: `include` directives resolve relative to the
    * file (then classpath), the Typesafe-Config behavior reference users
    * migrate from. The string entry points stay include-free by design. */
  def parseHoconFile(path: String): Either[List[String], MaskStage] =
    Hocon.parseFile(path).flatMap(parse)

  def parseJson(json: String): Either[List[String], MaskStage] =
    jsonToMap(json).flatMap(parse)

  private def jsonToMap(json: String): Either[List[String], Map[String, Any]] = {
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
        Right(fields.map { case (k, v) => k -> toAny(v) }.toMap)
      case _ => Left(List("stage config must be a JSON object"))
    }
  }

  /** Validate a parsed MaskDataTransform config map. Accumulates every
    * error. */
  def parse(config: Map[String, Any]): Either[List[String], MaskStage] = {
    val name = requiredString(config, "name")
    val description = optionalString(config, "description")
    val environments = environmentsList(config)
    val inputView = requiredString(config, "inputView")
    val outputView = requiredString(config, "outputView")
    val persist = optionalBool(config, "persist", default = false)
    val params = stringMap(config, "params")
    collect(name, description, environments, inputView, outputView, persist, params)(
      unknownKeys(config, ExpectedKeys)) {
      MaskStage(
        name.toOption.get, description.toOption.get, environments.toOption.get,
        inputView.toOption.get, outputView.toOption.get, persist.toOption.get, params.toOption.get)
    }
  }

  private def parseExtract(stageType: String, config: Map[String, Any]): Either[List[String], ExtractStage] = {
    val name = requiredString(config, "name")
    val description = optionalString(config, "description")
    val environments = environmentsList(config)
    val inputURI = requiredString(config, "inputURI")
    val outputView = requiredString(config, "outputView")
    val persist = optionalBool(config, "persist", default = false)
    val header = optionalBool(config, "header", default = false)
    val numPartitions = optionalInt(config, "numPartitions")
    collect(name, description, environments, inputURI, outputView, persist, header, numPartitions)(
      unknownKeys(config, ExpectedKeysByType(stageType))) {
      ExtractStage(stageType, name.toOption.get, description.toOption.get, environments.toOption.get,
        inputURI.toOption.get, outputView.toOption.get, persist.toOption.get,
        header.toOption.get, numPartitions.toOption.get)
    }
  }

  private def parseMetadata(config: Map[String, Any]): Either[List[String], MetadataStage] = {
    val name = requiredString(config, "name")
    val description = optionalString(config, "description")
    val environments = environmentsList(config)
    val inputView = requiredString(config, "inputView")
    val outputView = requiredString(config, "outputView")
    val persist = optionalBool(config, "persist", default = false)
    val treatments = stringMap(config, "treatments").flatMap {
      case m if m.isEmpty => Left("'treatments' must map at least one column to a treatment expression.")
      case m => Right(m)
    }
    collect(name, description, environments, inputView, outputView, persist, treatments)(
      unknownKeys(config, ExpectedKeysByType("MetadataTransform"))) {
      MetadataStage(name.toOption.get, description.toOption.get, environments.toOption.get,
        inputView.toOption.get, outputView.toOption.get, persist.toOption.get, treatments.toOption.get)
    }
  }

  private def parseSql(config: Map[String, Any]): Either[List[String], SqlStage] = {
    val name = requiredString(config, "name")
    val description = optionalString(config, "description")
    val environments = environmentsList(config)
    val sql = requiredString(config, "sql")
    val outputView = requiredString(config, "outputView")
    val persist = optionalBool(config, "persist", default = false)
    val sqlParams = stringMap(config, "sqlParams")
    collect(name, description, environments, sql, outputView, persist, sqlParams)(
      unknownKeys(config, ExpectedKeysByType("SQLTransform"))) {
      SqlStage(name.toOption.get, description.toOption.get, environments.toOption.get,
        sql.toOption.get, outputView.toOption.get, persist.toOption.get, sqlParams.toOption.get)
    }
  }

  private def parseLoad(config: Map[String, Any]): Either[List[String], LoadStage] = {
    val name = requiredString(config, "name")
    val description = optionalString(config, "description")
    val environments = environmentsList(config)
    val inputView = requiredString(config, "inputView")
    val outputURI = requiredString(config, "outputURI")
    val numPartitions = optionalInt(config, "numPartitions")
    collect(name, description, environments, inputView, outputURI, numPartitions)(
      unknownKeys(config, ExpectedKeysByType("ParquetLoad"))) {
      LoadStage(name.toOption.get, description.toOption.get, environments.toOption.get,
        inputView.toOption.get, outputURI.toOption.get, numPartitions.toOption.get)
    }
  }

  /** Dispatch on the `type` key. A stage with no `type` is a
    * MaskDataTransform (the single-stage entry points never required one,
    * and that behavior is kept). */
  def parseStage(config: Map[String, Any]): Either[List[String], PipelineStage] =
    config.getOrElse("type", "MaskDataTransform") match {
      case "MaskDataTransform" => parse(config)
      case t @ ("ParquetExtract" | "DelimitedExtract") => parseExtract(t.toString, config)
      case "MetadataTransform" => parseMetadata(config)
      case "SQLTransform" => parseSql(config)
      case "ParquetLoad" => parseLoad(config)
      case other => Left(List(s"Unknown stage type '$other'."))
    }

  /** Parse a `{"stages": [...]}` pipeline document (HOCON or JSON). EVERY
    * stage is validated; errors accumulate across stages, each prefixed
    * `stage <index> (<name>):` so a 12-stage config with three broken
    * stages reports all three at once. */
  def parsePipeline(conf: String): Either[List[String], List[PipelineStage]] =
    Hocon.parse(conf).flatMap(parsePipelineMap)

  def parsePipelineFile(path: String): Either[List[String], List[PipelineStage]] =
    Hocon.parseFile(path).flatMap(parsePipelineMap)

  private def parsePipelineMap(root: Map[String, Any]): Either[List[String], List[PipelineStage]] =
    root.get("stages") match {
      case Some(xs: Seq[_]) if xs.nonEmpty =>
        val results = xs.toList.zipWithIndex.map {
          case (m: Map[_, _], i) =>
            val cfg = m.map { case (k, v) => k.toString -> v }.toMap[String, Any]
            val label = cfg.get("name") match {
              case Some(s: String) if s.nonEmpty => s"'$s'"
              case _ => "unnamed"
            }
            parseStage(cfg).left.map(_.map(e => s"stage $i ($label): $e"))
          case (_, i) => Left(List(s"stage $i: must be an object."))
        }
        val errors = results.flatMap(_.left.getOrElse(Nil))
        if (errors.nonEmpty) Left(errors)
        else Right(results.flatMap(_.toOption))
      case Some(_) => Left(List("'stages' must be a non-empty array of stage objects."))
      case None => Left(List("Missing required attribute 'stages'."))
    }

  /** Parse (HOCON or JSON), validate, and execute one stage against a
    * session in one step. */
  def run(spark: SparkSession, conf: String): Either[List[String], DataFrame] =
    parseHocon(conf).map { stage =>
      MaskTransform.runStage(spark, stage.inputView, stage.outputView, stage.persist)._1
    }

  /** Environment-gated execution — the host-dataflow semantics the
    * `environments` key exists for: a stage whose list does not contain the
    * ACTIVE environment is validated but SKIPPED, not an error (e.g. a
    * production-only masking stage under "test"). An empty list means run
    * everywhere. Returns Right(None) when skipped. */
  def runIfEnvironment(spark: SparkSession, conf: String,
                       activeEnvironment: String): Either[List[String], Option[DataFrame]] =
    parseHocon(conf).map { stage =>
      if (stage.environments.nonEmpty && !stage.environments.contains(activeEnvironment)) None
      else Some(MaskTransform.runStage(spark, stage.inputView, stage.outputView, stage.persist)._1)
    }

  /** The multi-stage pipeline runner — the `{"stages": [...]}` host loop.
    *
    * Contract (reference host semantics, SURVEY §3 entry point A):
    *   1. validate EVERY stage first — any error anywhere means NOTHING
    *      executes (no partial pipelines, no half-published views);
    *   2. walk valid stages in order on the driver; dataflow between stages
    *      is session-catalog view names (`outputView` -> next `inputView`);
    *   3. each stage is environment-gated individually: a stage whose
    *      `environments` excludes `activeEnvironment` is skipped, and the
    *      pipeline continues — gating composes per stage, not per document;
    *   4. a RUNTIME failure (missing view, bad SQL) aborts the walk with
    *      the failing stage's index and name in the exception, leaving
    *      earlier stages' views published (exactly the reference's
    *      behavior: execution is sequential and effects are the catalog).
    *
    * Returns the last EXECUTED stage's frame (None when every stage was
    * gated out). */
  def runPipeline(spark: SparkSession, conf: String,
                  activeEnvironment: String): Either[List[String], Option[DataFrame]] =
    parsePipeline(conf).map(executePipeline(spark, _, activeEnvironment))

  def runPipelineFile(spark: SparkSession, path: String,
                      activeEnvironment: String): Either[List[String], Option[DataFrame]] =
    parsePipelineFile(path).map(executePipeline(spark, _, activeEnvironment))

  private def executePipeline(spark: SparkSession, stages: List[PipelineStage],
                              activeEnvironment: String): Option[DataFrame] = {
    var last: Option[DataFrame] = None
    stages.zipWithIndex.foreach { case (stage, i) =>
      val gatedIn = stage.environments.isEmpty || stage.environments.contains(activeEnvironment)
      if (gatedIn) {
        try last = Some(executeStage(spark, stage))
        catch {
          case scala.util.control.NonFatal(e) => throw new RuntimeException(
            s"stage $i ('${stage.name}', ${stage.stageType}) failed: ${e.getMessage}", e)
        }
      }
    }
    last
  }

  /** Publish a frame as `outputView`; `persist` materializes it eagerly
    * (MEMORY_AND_DISK_SER + count — the reference's persist contract) so
    * later stages re-read the cache instead of recomputing the lineage. */
  private def publish(df: DataFrame, outputView: String, persist: Boolean): DataFrame = {
    df.createOrReplaceTempView(outputView)
    if (persist && !df.isStreaming) {
      df.persist(StorageLevel.MEMORY_AND_DISK_SER)
      df.count()
    }
    df
  }

  private def executeStage(spark: SparkSession, stage: PipelineStage): DataFrame = stage match {
    case s: MaskStage =>
      MaskTransform.runStage(spark, s.inputView, s.outputView, s.persist)._1
    case s: ExtractStage =>
      val raw = s.stageType match {
        case "ParquetExtract" => spark.read.parquet(s.inputURI)
        case "DelimitedExtract" => spark.read.option("header", s.header).csv(s.inputURI)
      }
      // repartition, not coalesce: the point is spreading a one-split file
      // across cores for downstream per-cell KDF work
      publish(s.numPartitions.fold(raw)(raw.repartition), s.outputView, s.persist)
    case s: MetadataStage =>
      val df = spark.table(s.inputView)
      val missing = s.treatments.keySet.diff(df.columns.toSet)
      require(missing.isEmpty,
        s"treatments name columns not in '${s.inputView}': ${missing.toList.sorted.mkString(", ")}")
      val projected = df.columns.map { c =>
        s.treatments.get(c) match {
          case Some(t) =>
            val meta = new MetadataBuilder().putMetadata("mask",
              new MetadataBuilder().putStringArray("treatments", Array(t)).build()).build()
            df(s"`$c`").as(c, meta)
          case None => df(s"`$c`")
        }
      }
      publish(df.select(projected.toIndexedSeq: _*), s.outputView, s.persist)
    case s: SqlStage =>
      val stmt = s.sqlParams.foldLeft(s.sql) { case (acc, (k, v)) =>
        acc.replace("${" + k + "}", v)
      }
      publish(spark.sql(stmt), s.outputView, s.persist)
    case s: LoadStage =>
      val df = spark.table(s.inputView)
      s.numPartitions.fold(df)(df.repartition).write.mode("overwrite").parquet(s.outputURI)
      df
  }
}

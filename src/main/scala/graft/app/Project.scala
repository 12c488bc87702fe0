package graft.app

import graft.core._
import graft.core.Result.Result
import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** YAML project loader (sayn/core/project.py, sayn/core/settings.py):
  *
  *   project.yaml   — parameters, presets, autogroups (`groups:`)
  *   tasks dir      — one yaml per task group (`tasks: {name: {...}}`),
  *                    group = file stem
  *   settings.yaml  — profiles: parameters + stringify + from_prod;
  *                    `default_profile`; env overrides GRAFT_PROFILE,
  *                    GRAFT_PARAMETER_<name>,
  *                    GRAFT_{DATABASE|SCHEMA|TABLE}_{PREFIX|SUFFIX|OVERRIDE}
  *                    and GRAFT_FROM_PROD (settings.py:14-102 semantics)
  *
  * SQL tasks reference files under `sql/` via `file_name`; autogroups expand
  * a glob into one task per file with `{{ task.name }}` available
  * (project.py:281-440).
  */
object Project {

  final case class Loaded(
      specs: Seq[TaskSpec],
      parameters: Map[String, Any],
      stringify: StringifyConfig,
      prodStringify: StringifyConfig,
      fromProd: Seq[String],
      defaultDb: String)

  // ---- yaml plumbing -----------------------------------------------------

  private def toScala(v: Any): Any = v match {
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, x) => k.toString -> toScala(x) }.toMap
    case l: java.util.List[_] => l.asScala.map(toScala).toSeq
    case other => other
  }

  def parseYaml(text: String): Result[Map[String, Any]] =
    Result.attempt {
      val yaml = new org.yaml.snakeyaml.Yaml()
      Option(yaml.load[java.util.Map[String, Object]](text))
        .map(m => toScala(m).asInstanceOf[Map[String, Any]])
        .getOrElse(Map.empty)
    }

  private def mapAt(m: Map[String, Any], key: String): Map[String, Any] =
    m.get(key) match {
      case Some(mm: Map[_, _]) => mm.asInstanceOf[Map[String, Any]]
      case _ => Map.empty
    }

  // ---- loading -------------------------------------------------------------

  /** Template loader for `{% include %}` / `{% import %}`: resolves
    * paths against the project directory (the reference's
    * FileSystemLoader(Path("."))), refusing traversal outside it — a
    * template must not read `../../etc/passwd` however the path is
    * spelled.
    */
  def fileLoader(projectDir: Path): String => Option[String] = { rel =>
    val root = projectDir.toAbsolutePath.normalize
    val p = root.resolve(rel).normalize
    if (p.startsWith(root) && Files.isRegularFile(p))
      Some(Files.readString(p))
    else None
  }

  def load(
      projectDir: Path,
      profileOverride: Option[String] = None,
      env: Map[String, String] = sys.env): Result[Loaded] = {
    val projectFile = projectDir.resolve("project.yaml")
    if (!Files.exists(projectFile))
      return Left(ConfigError(s"missing ${projectFile}"))

    for {
      project <- parseYaml(Files.readString(projectFile))
      settings <- {
        val f = projectDir.resolve("settings.yaml")
        if (Files.exists(f)) parseYaml(Files.readString(f))
        else Right(Map.empty[String, Any])
      }
      groupsLoaded <- loadTaskGroups(projectDir)
      (groupSpecs, groupPresets) = groupsLoaded
      autoSpecs <- expandAutogroups(projectDir, mapAt(project, "groups"))
      withPresets <- applyPresets(
        groupSpecs ++ autoSpecs, groupPresets, mapAt(project, "presets"))
    } yield {
      // profile selection: flag > GRAFT_PROFILE > default_profile > first
      val profiles = mapAt(settings, "profiles")
      val profileName = profileOverride
        .orElse(env.get("GRAFT_PROFILE"))
        .orElse(settings.get("default_profile").map(_.toString))
        .orElse(profiles.keys.toSeq.sorted.headOption)
      val profile = profileName.map(mapAt(profiles, _)).getOrElse(Map.empty)

      // parameters: project defaults <- profile <- env GRAFT_PARAMETER_*
      val envParams = env.collect {
        case (k, v) if k.startsWith("GRAFT_PARAMETER_") =>
          k.stripPrefix("GRAFT_PARAMETER_").toLowerCase -> (v: Any)
      }
      val parameters =
        mapAt(project, "parameters") ++ mapAt(profile, "parameters") ++ envParams

      // stringify/from_prod env overrides (sayn/core/settings.py:14-102,
      // 285-316): GRAFT_{DATABASE|SCHEMA|TABLE}_{PREFIX|SUFFIX|OVERRIDE}
      // update the dev stringify; GRAFT_FROM_PROD (comma-separated globs)
      // REPLACES from_prod. Like the reference's profile_name-is-None
      // gate, they apply only when no explicit --profile was passed.
      val envOverridesActive = profileOverride.isEmpty
      val envStringify: Map[String, Any] =
        if (!envOverridesActive) Map.empty
        else (for {
          t <- Seq("DATABASE", "SCHEMA", "TABLE")
          s <- Seq("PREFIX", "SUFFIX", "OVERRIDE")
          // set-but-empty env vars fall through like empty profile values
          // (truthiness fallback, objects.py:77) instead of masking
          // prod_stringify with ""
          v <- env.get(s"GRAFT_${t}_$s") if v.nonEmpty
        } yield s"${t.toLowerCase}_${s.toLowerCase}" -> (v: Any)).toMap
      val envFromProd: Option[Seq[String]] =
        if (!envOverridesActive) None
        else env.get("GRAFT_FROM_PROD")
          .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)

      def mangling(m: Map[String, Any], t: String): Mangling = Mangling(
        prefix = m.get(s"${t}_prefix").map(_.toString),
        suffix = m.get(s"${t}_suffix").map(_.toString),
        overrideFmt = m.get(s"${t}_override").map(_.toString))
      def stringifyOf(m: Map[String, Any]): StringifyConfig = StringifyConfig(
        database = mangling(m, "database"),
        schema = mangling(m, "schema"),
        table = mangling(m, "table"))

      // dev stringify falls back per-key to prod_stringify (objects.py:77:
      // {k: v or prod_stringify[k]}), so a profile defining only
      // prod_stringify still mangles dev objects. The reference fallback is
      // truthiness-based: an explicit null/empty profile value falls back to
      // prod rather than overriding it (and would otherwise NPE in mangling).
      val prodStringifyMap = mapAt(settings, "prod_stringify")
      val devStringifyMap = prodStringifyMap ++ mapAt(profile, "stringify")
        .filter { case (_, v) => v != null && v.toString.nonEmpty } ++
        envStringify

      Loaded(
        specs = withPresets,
        parameters = parameters,
        stringify = stringifyOf(devStringifyMap),
        prodStringify = stringifyOf(prodStringifyMap),
        fromProd = envFromProd.getOrElse(profile.get("from_prod") match {
          case Some(xs: Seq[_]) => xs.map(_.toString)
          case _ => Nil
        }),
        defaultDb = project.get("default_db").map(_.toString).getOrElse("spark"))
    }
  }

  /** Preset resolution (sayn/core/project.py:101-205):
    *
    *   - project presets may inherit from each other via their own
    *     `preset:` key — a DAG, walked ancestor-first; cycles and unknown
    *     names are config errors;
    *   - task-group files may declare their own `presets:`, which may
    *     inherit from PROJECT presets (one hop, like the reference);
    *   - a task's `preset:` resolves against its group's presets first,
    *     then the project's.
    *
    * Merge order everywhere: ancestor ← descendant ← task (task wins).
    */
  private def applyPresets(
      specs: Seq[TaskSpec],
      groupPresets: Map[String, Map[String, Any]],
      projectPresets: Map[String, Any]): Result[Seq[TaskSpec]] = {

    def asMap(name: String, v: Any): Result[Map[String, Any]] = v match {
      case m: Map[_, _] => Right(m.asInstanceOf[Map[String, Any]])
      case _ => Left(ConfigError(s"preset '$name' must be a mapping"))
    }

    def resolveProject(name: String, seen: Seq[String]): Result[Map[String, Any]] =
      if (seen.contains(name))
        Left(ConfigError(s"preset cycle: ${(seen :+ name).mkString(" -> ")}"))
      else projectPresets.get(name) match {
        case None => Left(ConfigError(s"unknown preset '$name'"))
        case Some(v) => asMap(name, v).flatMap { m =>
          m.get("preset").map(_.toString) match {
            case Some(parent) =>
              resolveProject(parent, seen :+ name).map(_ ++ (m - "preset"))
            case None => Right(m)
          }
        }
      }

    def resolve(name: String, group: String): Result[Map[String, Any]] =
      groupPresets.getOrElse(group, Map.empty).get(name) match {
        case Some(v) => asMap(name, v).flatMap { m =>
          m.get("preset").map(_.toString) match {
            case Some(parent) => resolveProject(parent, Nil).map(_ ++ (m - "preset"))
            case None => Right(m)
          }
        }
        case None => resolveProject(name, Nil)
      }

    Result.sequence(specs.map { s =>
      s.cfg.get("preset").map(_.toString) match {
        case Some(p) =>
          resolve(p, s.group).map(pc => s.copy(cfg = pc ++ (s.cfg - "preset")))
        case None => Right(s)
      }
    })
  }

  /** tasks-dir yamls → TaskSpecs + per-group presets; group name = file
    * stem (project.py:83-93).
    */
  private def loadTaskGroups(
      projectDir: Path): Result[(Seq[TaskSpec], Map[String, Map[String, Any]])] = {
    val tasksDir = projectDir.resolve("tasks")
    if (!Files.exists(tasksDir)) return Right((Nil, Map.empty))
    val files = Files.list(tasksDir).iterator().asScala
      .filter(f => f.toString.endsWith(".yaml") || f.toString.endsWith(".yml"))
      .toSeq.sortBy(_.toString)
    Result.sequence(files.map { f =>
      val group = f.getFileName.toString.replaceAll("\\.ya?ml$", "")
      parseYaml(Files.readString(f)).flatMap { y =>
        Result.sequence(mapAt(y, "tasks").toSeq.sortBy(_._1).map {
          case (name, cfg: Map[_, _]) =>
            inlineSqlFile(projectDir, name,
              cfg.asInstanceOf[Map[String, Any]]).map(TaskSpec(name, group, _))
          case (name, _) =>
            Left(ConfigError(s"task $name: config must be a mapping"))
        }).map(specs => (specs, group -> mapAt(y, "presets")))
      }
    }).map { loaded =>
      (loaded.flatMap(_._1), loaded.map(_._2).filter(_._2.nonEmpty).toMap)
    }
  }

  /** `file_name` → inline `sql` contents, templating `{{ task.name }}`
    * later at compile time (sql files live under sql/, python-analog tasks
    * register in code).
    */
  private def inlineSqlFile(
      projectDir: Path, name: String, cfg: Map[String, Any]): Result[Map[String, Any]] =
    cfg.get("file_name") match {
      case Some(fn: String) =>
        val p = projectDir.resolve("sql").resolve(fn)
        if (!Files.exists(p))
          Left(ConfigError(s"task $name: missing sql file $p"))
        else Right(cfg ++ Map("sql" -> Files.readString(p)))
      case _ => Right(cfg)
    }

  /** Autogroups (project.py:281-440): a project.yaml `groups:` entry expands
    * a `file_name` glob into one task per matching sql file, named by stem.
    */
  private def expandAutogroups(
      projectDir: Path, groups: Map[String, Any]): Result[Seq[TaskSpec]] =
    Result.sequence(groups.toSeq.sortBy(_._1).map {
      case (group, cfg: Map[_, _]) =>
        val cfgMap = cfg.asInstanceOf[Map[String, Any]]
        cfgMap.get("file_name") match {
          case Some(glob: String) =>
            val sqlDir = projectDir.resolve("sql")
            val matcher = java.nio.file.FileSystems.getDefault
              .getPathMatcher(s"glob:$glob")
            val files =
              if (!Files.exists(sqlDir)) Nil
              else Files.walk(sqlDir).iterator().asScala
                .filter(Files.isRegularFile(_))
                .filter(f => matcher.matches(sqlDir.relativize(f)))
                .toSeq.sortBy(_.toString)
            Result.sequence(files.map { f =>
              val name = f.getFileName.toString.replaceAll("\\.sql$", "")
              Result.attempt(Files.readString(f)).map { sql =>
                TaskSpec(name, group, cfgMap - "file_name" ++ Map("sql" -> sql))
              }
            })
          case _ =>
            Left(ConfigError(s"autogroup $group: needs file_name glob"))
        }
      case (group, _) => Left(ConfigError(s"autogroup $group: must be a mapping"))
    }).map(_.flatten)
}

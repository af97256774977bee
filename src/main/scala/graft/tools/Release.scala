package graft.tools

/** Ops/CLI release flow — the engine-side equivalent of the reference's
  * `cli.py` (bump → git tag → docker build/tag → publish,
  * /root/reference/cli.py:24-120), reshaped for a library: the version
  * lives in a VERSION file (the reference reads `poetry version -s`), and
  * every side effect is a generated command PLAN executed through an
  * injectable runner — testable offline, auditable before it runs.
  *
  * Reference quirk, deliberately NOT mirrored: cli.py compares versions by
  * `int(version.replace(".", ""))` (cli.py:99-101), under which
  * 1.2.10 (→1210) outranks 1.3.0 (→130). Semver compares componentwise
  * here; the quirk is documented so a behavior diff traces to a decision.
  */
object Release {

  val DockerRegistry = "graft/engine" // reference: DOCKER_REGISTRY, cli.py:6
  val Bumps = Seq("patch", "minor", "major")

  final case class Version(major: Int, minor: Int, patch: Int) {
    override def toString = s"$major.$minor.$patch"
  }

  private val SemVer = """(\d+)\.(\d+)\.(\d+)""".r

  def parse(s: String): Version = s.trim match {
    case SemVer(ma, mi, pa) => Version(ma.toInt, mi.toInt, pa.toInt)
    case other => throw new IllegalArgumentException(s"not a semver string: '$other'")
  }

  def bump(v: Version, bumpType: String): Version =
    bumpType.toLowerCase match {
      case "patch" => v.copy(patch = v.patch + 1)
      case "minor" => Version(v.major, v.minor + 1, 0)
      case "major" => Version(v.major + 1, 0, 0)
      case other => throw new IllegalArgumentException(
        s"bump must be one of ${Bumps.mkString("/")}, got '$other'")
    }

  /** Componentwise semver ordering (see the header for the reference's
    * digit-concat quirk this replaces). */
  implicit val versionOrdering: Ordering[Version] =
    Ordering.by(v => (v.major, v.minor, v.patch))

  /** The bump command plan: write the version file (the SAME path main
    * reads the current version from — a hardcoded "VERSION" here would
    * leave a GRAFT_VERSION_FILE install permanently stuck on the old
    * number), tag git, optionally push the tag (cli.py:71-83). */
  def bumpPlan(current: Version, bumpType: String, pushTag: Boolean,
               versionFile: String = "VERSION"): (Version, Seq[String]) = {
    val next = bump(current, bumpType)
    val cmds = Seq(
      s"echo $next > $versionFile",
      s"git add $versionFile && git commit -m 'release $next'",
      s"git tag $next") ++
      (if (pushTag) Seq(s"git push origin $next") else Nil)
    (next, cmds)
  }

  /** The build command plan: assemble the fat jar and tag the image with
    * the version AND latest (cli.py:51-61; sbt-assembly stands in for the
    * poetry-requirements export). */
  def buildPlan(version: Version): Seq[String] = Seq(
    "sbt assembly",
    s"docker build -f Dockerfile -t $DockerRegistry:$version -t $DockerRegistry:latest .")

  /** The publish plan (cli.py:115-120). */
  def publishPlan(version: Version): Seq[String] = Seq(
    s"docker push $DockerRegistry:$version",
    s"docker push $DockerRegistry:latest")

  /** CLI arg vector → command plan (the whole main minus env and I/O —
    * what the execute-mode spec drives against stub binaries). */
  def plan(args: Seq[String], current: Version,
           versionFile: String): Seq[String] = args match {
    case Seq("bump", bumpType) =>
      bumpPlan(current, bumpType, pushTag = false, versionFile)._2
    case Seq("bump", bumpType, "--push") =>
      bumpPlan(current, bumpType, pushTag = true, versionFile)._2
    case Seq("build") => buildPlan(current)
    case Seq("publish") => publishPlan(current)
    case other => throw new IllegalArgumentException(
      s"usage: bump <patch|minor|major> [--push] | build | publish (got: $other)")
  }

  /** The execute-mode runner: each plan line through `sh -c`, failing
    * loudly on the FIRST non-zero rc (a half-executed release must stop,
    * not keep tagging). `cwd`/`pathPrepend` exist so the spec can point
    * the run at a temp repo with stub `git`/`docker`/`sbt` on PATH; main
    * passes neither. */
  def shellRunner(cwd: Option[java.nio.file.Path] = None,
                  pathPrepend: Option[String] = None): String => Unit =
    cmd => {
      val pb = new ProcessBuilder("sh", "-c", cmd)
      cwd.foreach(d => pb.directory(d.toFile))
      pathPrepend.foreach(p => pb.environment().put("PATH",
        p + ":" + Option(pb.environment().get("PATH")).getOrElse("")))
      pb.inheritIO()
      val rc = pb.start().waitFor()
      require(rc == 0, s"command failed ($rc): $cmd")
    }

  /** Entry point: `runMain graft.tools.Release <bump|build|publish> [args]`.
    * Dry-run by default (prints the plan) unless GRAFT_RELEASE_EXECUTE=1 —
    * the auditable-before-it-runs stance.
    */
  def main(args: Array[String]): Unit = {
    val versionFile = java.nio.file.Paths.get(
      sys.env.getOrElse("GRAFT_VERSION_FILE", "VERSION"))
    val current =
      if (java.nio.file.Files.exists(versionFile))
        parse(java.nio.file.Files.readString(versionFile))
      else Version(0, 0, 0)
    val execute = sys.env.get("GRAFT_RELEASE_EXECUTE").contains("1")
    val runner: String => Unit =
      if (execute) shellRunner()
      else cmd => println(s"[dry-run] $cmd")
    plan(args.toSeq, current, versionFile.toString).foreach(runner)
  }
}

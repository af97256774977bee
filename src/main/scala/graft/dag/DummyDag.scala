package graft.dag

/** Twin of the reference's scaffold DAG (dags/dummy_dag.py:1-26) — the
  * "umbrella example" with no-op operators. It has no compute, but it is
  * the one reference DAG whose dependency graph BRANCHES and re-merges
  * (two fetch→clean legs joining into train→deploy), so its twin
  * exercises [[Dag.topoSort]]'s branch/merge path that the linear dreem
  * chain never hits, and pins the generator on a non-linear topology.
  *
  * Rendered with `EmptyOperator` — the current name of the reference's
  * `DummyOperator` (removed in Airflow 3); same no-op semantics.
  */
object DummyDag {

  val dagId = "graft_dummy"

  /** Task-for-task the reference graph (dags/dummy_dag.py:15-26). */
  val tasks: Seq[Task] = Seq(
    Task("fetch_weather_forecast"),
    Task("fetch_sales_data"),
    Task("clean_forecast_data", upstream = Seq("fetch_weather_forecast")),
    Task("clean_sales_data", upstream = Seq("fetch_sales_data")),
    Task("join_datasets",
      upstream = Seq("clean_forecast_data", "clean_sales_data")),
    Task("train_ml_model", upstream = Seq("join_datasets")),
    Task("deploy_ml_model", upstream = Seq("train_ml_model")))

  def render: String = {
    val ordered = Dag.topoSort(tasks)
    val ops = ordered.map { t =>
      s"""    ${t.id} = EmptyOperator(task_id="${t.id}")"""
    }.mkString("\n")
    val edges = ordered.filter(_.upstream.nonEmpty).map { t =>
      val up =
        if (t.upstream.size == 1) t.upstream.head
        else t.upstream.mkString("[", ", ", "]")
      s"""    $up >> ${t.id}"""
    }.mkString("\n")
    s"""\"\"\"$dagId — the reference's umbrella scaffold (dags/dummy_dag.py)
       |with no-op operators; kept as the branching-topology example.
       |
       |GENERATED from graft.dag.DummyDag.render — edit there, not here
       |(DagSpec pins this file to the generator; regenerate with
       |``sbt "runMain graft.dag.DummyDag"``).
       |\"\"\"
       |from datetime import datetime
       |
       |from airflow import DAG
       |from airflow.operators.empty import EmptyOperator
       |
       |with DAG(
       |    dag_id="$dagId",
       |    description="Dummy dag with the Umbrella Example.",
       |    start_date=datetime(2021, 11, 1),
       |    schedule="@daily",
       |    catchup=False,
       |) as dag:
       |$ops
       |
       |$edges
       |""".stripMargin
  }

  /** Regenerate dags/graft_dummy.py (path relative to the repo root). */
  def main(args: Array[String]): Unit = {
    val target = java.nio.file.Paths.get(
      if (args.nonEmpty) args(0) else "dags/graft_dummy.py")
    Option(target.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.write(target,
      render.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"wrote $target")
  }
}

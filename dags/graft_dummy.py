"""graft_dummy — the reference's umbrella scaffold (dags/dummy_dag.py)
with no-op operators; kept as the branching-topology example.

GENERATED from graft.dag.DummyDag.render — edit there, not here
(DagSpec pins this file to the generator; regenerate with
``sbt "runMain graft.dag.DummyDag"``).
"""
from datetime import datetime

from airflow import DAG
from airflow.operators.empty import EmptyOperator

with DAG(
    dag_id="graft_dummy",
    description="Dummy dag with the Umbrella Example.",
    start_date=datetime(2021, 11, 1),
    schedule="@daily",
    catchup=False,
) as dag:
    fetch_weather_forecast = EmptyOperator(task_id="fetch_weather_forecast")
    fetch_sales_data = EmptyOperator(task_id="fetch_sales_data")
    clean_forecast_data = EmptyOperator(task_id="clean_forecast_data")
    clean_sales_data = EmptyOperator(task_id="clean_sales_data")
    join_datasets = EmptyOperator(task_id="join_datasets")
    train_ml_model = EmptyOperator(task_id="train_ml_model")
    deploy_ml_model = EmptyOperator(task_id="deploy_ml_model")

    fetch_weather_forecast >> clean_forecast_data
    fetch_sales_data >> clean_sales_data
    [clean_forecast_data, clean_sales_data] >> join_datasets
    join_datasets >> train_ml_model
    train_ml_model >> deploy_ml_model

from streamz_postgres_spark.streaming.runner import replay_events, run_to_table

__all__ = ["replay_events", "run_to_table"]

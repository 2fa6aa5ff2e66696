from streamz_postgres_spark.plans.scale import explain_summary, salted_join

__all__ = ["explain_summary", "salted_join"]

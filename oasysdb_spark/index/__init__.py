from oasysdb_spark.index.ivf import assign_clusters, build_index, split_oversized_clusters

__all__ = ["build_index", "assign_clusters", "split_oversized_clusters"]

"""Comparison core: estimators, measures, LSH index, KNN, dedup."""

"""Query-processing value-add operators (SURVEY.md §2.F-§2.H).

Python/PySpark counterparts of the reference's Catalyst extension rules:
z-order clustering, watchdog scan limits, rebalance-before-write,
row-filter/column-masking authorization, and column lineage.
"""

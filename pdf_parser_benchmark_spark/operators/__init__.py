"""Relational operators re-expressed Spark-first. Each module maps one row
of SURVEY.md §2's inventory onto DataFrame built-ins (explode/groupBy/
window/anti-join); pandas UDFs only where flagged.
"""

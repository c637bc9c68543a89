"""Logical plans: warehouse ETL builders and headline analytical queries."""

"""Recommender (SURVEY.md SS2.10): ALS + MMR + ranking evaluation."""

"""Evaluation, logging, drawing utilities."""

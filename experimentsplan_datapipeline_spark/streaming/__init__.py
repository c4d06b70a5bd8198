"""Structured Streaming operators: the reference's incremental pipeline
shapes (step log, periodic triggers, EMA state, checkpoint sinks) as
watermarked streaming plans."""

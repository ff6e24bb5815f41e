"""End-to-end pipelines composing the stages."""

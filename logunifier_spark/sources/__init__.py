"""Ingress converters: transcripts (primary), native-ECS JSON, journald JSON.
Each maps a raw source shape into the common envelope column set consumed by
pipeline.unify — the Spark analog of the reference's MetaLogConverter
(/root/reference/internal/streams/ingress/types.go:12-18)."""

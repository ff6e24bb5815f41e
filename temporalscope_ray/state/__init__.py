"""Driver-side state: lineage records, checkpoint/resume, manifests."""

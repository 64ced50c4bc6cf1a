"""Source/sink layer: document loading, index store, manifests, error ledger."""

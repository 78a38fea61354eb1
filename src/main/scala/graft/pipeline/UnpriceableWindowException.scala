package graft.pipeline

/** A commit window an incremental maintenance consumer cannot price
  * EXACTLY from sidecar metadata — a copy-on-write rebase collapsed
  * the per-commit deltas, an equality-delete sidecar lacks the
  * consumer's key columns, a referenced as-of version is no longer
  * retained, or the maintained state itself contradicts the window
  * (negative counts). The contract: catching THIS TYPE and falling
  * back to a full rebuild/recompute is always exact; the message is
  * for humans only. Extends IllegalStateException so callers that
  * predate the type (and specs pinning it) keep working; fallback
  * dispatch must match the type, never message substrings — a
  * reworded message must not silently re-wedge a consumer (see
  * [[graft.streaming.StreamingRollup]]). */
class UnpriceableWindowException(message: String)
    extends IllegalStateException(message)

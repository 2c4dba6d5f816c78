package graft.functions

/** splitmix64 finalizer — the standard public-domain bit mixer. The single
  * shared definition: block hashing (Embeddings.cosineNearDup) and the
  * synthetic corpus generator (sources.ArtificialPoints) must provably use
  * identical constants, so neither keeps a private copy. */
object BitMix {
  def splitmix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}

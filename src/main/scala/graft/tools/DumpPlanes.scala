package graft.tools

import scala.util.Random

/** Debug dump of the deterministic LSH hyperplanes / IVF centroids used by
  * q31/q32 (same seed + generation order as VectorQueries.randPlanes), as
  * JSON for oracle prototyping. Values print via Double.toString — the
  * shortest round-trip form, which re-parses to the identical double.
  */
object DumpPlanes {
  private def randPlanes(n: Int, dim: Int, seed: Long): Seq[Seq[Double]] = {
    val r = new Random(seed)
    Seq.fill(n)(Seq.fill(dim)(r.nextGaussian()))
  }
  def main(args: Array[String]): Unit = {
    def js(ps: Seq[Seq[Double]]): String =
      ps.map(_.mkString("[", ",", "]")).mkString("[", ",", "]")
    println(s"""{"lsh_planes":${js(randPlanes(8, 64, 42L))},""" +
      s""""ivf_centroids":${js(randPlanes(16, 64, 7L))}}""")
  }
}

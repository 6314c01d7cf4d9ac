package graft.ann

import breeze.linalg.{qr, DenseMatrix}

import scala.util.Random

/** Seeded random orthonormal rotation (reference:
  * /root/reference/inc/index/Rotator.hpp:14-19 — QR of a random matrix,
  * P = Qᵀ). Unlike the reference (which persists the matrix because its
  * RNG is unseeded), ours is deterministic from (dim, seed), so an index
  * can be rebuilt or loaded on any executor from two numbers.
  *
  * The matrix is small (paddedDim², ≤ a few MB for 1536-dim embeddings)
  * and is shipped to executors via a broadcast of the whole Rotator.
  */
final class Rotator(val dim: Int, val seed: Long) extends Serializable {
  val paddedDim: Int = Rotator.roundUp(dim, 64)

  /** Row-major P[out][in]: rotate(x)[o] = Σ_i P[o][i]·x[i]. */
  val matrix: Array[Array[Float]] = {
    val rnd = new Random(seed)
    val m = DenseMatrix.fill[Double](paddedDim, paddedDim)(rnd.nextGaussian())
    val q = qr.reduced(m).q
    Array.tabulate(paddedDim)(o => Array.tabulate(paddedDim)(i => q(i, o).toFloat))
  }

  /** Zero-pad to paddedDim. */
  def pad(v: Array[Float]): Array[Float] =
    if (v.length == paddedDim) v
    else java.util.Arrays.copyOf(v, paddedDim)

  /** Rotate a (possibly unpadded) vector. */
  def rotate(v: Array[Float]): Array[Float] = {
    val x = pad(v)
    val out = new Array[Float](paddedDim)
    var o = 0
    while (o < paddedDim) {
      val row = matrix(o)
      var s = 0.0; var i = 0
      while (i < paddedDim) { s += row(i).toDouble * x(i); i += 1 }
      out(o) = s.toFloat
      o += 1
    }
    out
  }
}

object Rotator {
  def roundUp(x: Int, m: Int): Int = ((x + m - 1) / m) * m
}

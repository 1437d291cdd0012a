package graft.operators

/** NON-autoregressive masked-denoising density model — the faithful
  * counterpart of the reference's `NARTransformer`
  * (scardina/models.py:435): full self-attention with NO causal mask
  * (models.py:211 "no mask for non-autoregressive") trained by random
  * masked-column denoising (models.py:340-352: draw a non-trivial mask
  * over the columns, zero the masked inputs, predict the masked values,
  * NLL averaged over the masked columns only). This closes the one
  * deliberate architecture divergence the AR transformer leg
  * ([[NarTransformer]]) documents: that leg keeps the chain-rule
  * factorization; this one trains the reference's actual objective and
  * recovers conditionals by the reference's masking trick at inference
  * (mask the target and the still-unknown columns, read the target
  * head's softmax given the observed ones).
  *
  * Determinism: the reference samples one random mask per step
  * (random.choice + random.sample). Here training is FULL-BATCH over
  * the weighted combo table × the ENUMERATED mask space — all 15
  * non-empty masks over 4 positions, size n uniform on {1..4} then a
  * uniform size-n subset (weight (1/4)/C(4,n)), with the reference's
  * 1/|mask| per-column averaging (models.py:337). This is the exact
  * expectation of the reference's stochastic step EXTENDED by the full
  * mask (the reference stops at n_cols−1 masked; see [[maskPatterns]]
  * for why the all-masked input must be in-distribution here), so the
  * fit is deterministic and the downstream rows hash-gate.
  *
  * Architecture per position i ∈ {0..3} (c, o, l, fanout):
  * x_i = posEmb_i + (masked ? 0 : emb_i(token_i)) — the reference's
  * `masked_x = x * ~mask` zeroes masked inputs the same way; one
  * single-head full-attention block with residual, ReLU FFN with
  * residual (the repo's minimal hand-backprop transformer block — no
  * LayerNorm, same as the AR leg, gradient-checked in the spec);
  * per-position softmax heads over each column's code domain.
  *
  * Scale posture is the NAR family's: the 100 TB work is producing the
  * weighted join-sample combo table; the fit runs on that bounded
  * catalog-sized input and the enumerated joint persists to the model
  * store.
  */
final class NarMlm(
    val cMax: Int, val oMax: Int, val lMax: Int, val fMax: Int,
    val d: Int, val h: Int, seed: Long) {

  private val nPos = 4
  private val vocab = Array(cMax, oMax, lMax, fMax)

  // flat layout: [posEmb 4d | embC | embO | embL | embF |
  //   Wq | Wk | Wv | Wo (d*d each) | W1 h*d | b1 h | W2 d*h | b2 d |
  //   U0 cMax*d | bo0 cMax | U1 | bo1 | U2 | bo2 | U3 | bo3]
  private val sizes: Array[Int] = Array(
    nPos * d, cMax * d, oMax * d, lMax * d, fMax * d,
    d * d, d * d, d * d, d * d,
    h * d, h, d * h, d,
    cMax * d, cMax, oMax * d, oMax, lMax * d, lMax, fMax * d, fMax)
  private val offs: Array[Int] = sizes.scanLeft(0)(_ + _)
  val nParams: Int = offs.last

  val params: Array[Double] = {
    val rng = new java.util.Random(seed)
    val p = Array.fill(nParams)(rng.nextGaussian() * 0.1)
    var s = 0
    while (s < sizes.length) {
      val isBias = s == 10 || s == 12 || (s >= 14 && s % 2 == 0)
      if (isBias) java.util.Arrays.fill(p, offs(s), offs(s + 1), 0.0)
      s += 1
    }
    p
  }

  @inline private def off(i: Int): Int = offs(i)
  private def embOff(i: Int, t: Int): Int = off(1 + i) + t * d
  private def headOff(i: Int): (Int, Int) = (off(13 + 2 * i), off(14 + 2 * i))

  private def mv(p: Array[Double], mo: Int, rows: Int, cols: Int,
      x: Array[Double], xo: Int, y: Array[Double], yo: Int): Unit = {
    var r = 0
    while (r < rows) {
      var acc = 0.0; var c = 0; val base = mo + r * cols
      while (c < cols) { acc += p(base + c) * x(xo + c); c += 1 }
      y(yo + r) += acc; r += 1
    }
  }

  private def mvGrad(p: Array[Double], g: Array[Double], mo: Int, rows: Int,
      cols: Int, x: Array[Double], xo: Int, dy: Array[Double], dyo: Int,
      dx: Array[Double], dxo: Int): Unit = {
    var r = 0
    while (r < rows) {
      val dyr = dy(dyo + r); val base = mo + r * cols
      var c = 0
      while (c < cols) {
        g(base + c) += dyr * x(xo + c)
        if (dx != null) dx(dxo + c) += p(base + c) * dyr
        c += 1
      }
      r += 1
    }
  }

  private def softmaxInPlace(a: Array[Double], o: Int, n: Int): Unit = {
    var m = Double.NegativeInfinity; var i = 0
    while (i < n) { if (a(o + i) > m) m = a(o + i); i += 1 }
    var z = 0.0; i = 0
    while (i < n) { val e = math.exp(a(o + i) - m); a(o + i) = e; z += e; i += 1 }
    i = 0
    while (i < n) { a(o + i) /= z; i += 1 }
  }

  private final class Pass {
    val x = new Array[Double](nPos * d)
    val q = new Array[Double](nPos * d)
    val k = new Array[Double](nPos * d)
    val v = new Array[Double](nPos * d)
    val a = new Array[Double](nPos * nPos) // FULL attention rows
    val ctx = new Array[Double](nPos * d)
    val y = new Array[Double](nPos * d)
    val u = new Array[Double](nPos * h)
    val z = new Array[Double](nPos * d)
    val probs = Array.tabulate(nPos)(i => new Array[Double](vocab(i)))
  }
  private val fwdPass = new Pass
  private val scale = 1.0 / math.sqrt(d.toDouble)

  /** Forward for tokens `t` (0-based codes, all four positions) under
    * `mask` (bit i set = position i masked: input zeroed, head i read).
    */
  private def forward(t: Array[Int], mask: Int, ps: Pass): Array[Array[Double]] = {
    val p = params
    java.util.Arrays.fill(ps.q, 0.0); java.util.Arrays.fill(ps.k, 0.0)
    java.util.Arrays.fill(ps.v, 0.0); java.util.Arrays.fill(ps.ctx, 0.0)
    var i = 0
    while (i < nPos) {
      val xb = i * d
      val masked = (mask & (1 << i)) != 0
      var j = 0
      while (j < d) {
        ps.x(xb + j) = p(off(0) + i * d + j) +
          (if (masked) 0.0 else p(embOff(i, t(i)) + j))
        j += 1
      }
      mv(p, off(5), d, d, ps.x, xb, ps.q, xb)
      mv(p, off(6), d, d, ps.x, xb, ps.k, xb)
      mv(p, off(7), d, d, ps.x, xb, ps.v, xb)
      i += 1
    }
    i = 0
    while (i < nPos) {
      // full (non-causal) scores over ALL j — models.py:211
      var j = 0
      while (j < nPos) {
        var s = 0.0; var c = 0
        while (c < d) { s += ps.q(i * d + c) * ps.k(j * d + c); c += 1 }
        ps.a(i * nPos + j) = s * scale
        j += 1
      }
      softmaxInPlace(ps.a, i * nPos, nPos)
      var c = 0
      while (c < d) {
        var acc = 0.0; j = 0
        while (j < nPos) { acc += ps.a(i * nPos + j) * ps.v(j * d + c); j += 1 }
        ps.ctx(i * d + c) = acc
        c += 1
      }
      val xb = i * d
      System.arraycopy(ps.x, xb, ps.y, xb, d)
      mv(p, off(8), d, d, ps.ctx, xb, ps.y, xb)
      var r = 0
      while (r < h) {
        var acc = p(off(10) + r); var cc = 0; val base = off(9) + r * d
        while (cc < d) { acc += p(base + cc) * ps.y(xb + cc); cc += 1 }
        ps.u(i * h + r) = if (acc > 0.0) acc else 0.0
        r += 1
      }
      c = 0
      while (c < d) { ps.z(xb + c) = ps.y(xb + c) + p(off(12) + c); c += 1 }
      mv(p, off(11), d, h, ps.u, i * h, ps.z, xb)
      val (uo, bo) = headOff(i)
      val pr = ps.probs(i)
      r = 0
      while (r < vocab(i)) {
        var acc = p(bo + r); var cc = 0; val base = uo + r * d
        while (cc < d) { acc += p(base + cc) * ps.z(xb + cc); cc += 1 }
        pr(r) = acc; r += 1
      }
      softmaxInPlace(pr, 0, vocab(i))
      i += 1
    }
    ps.probs
  }

  /** All non-empty masks (1..nPos positions masked), mask size uniform
    * then a uniform subset: weight (1/nPos)·(1/C(nPos,|m|)). One
    * documented divergence from the reference's draw (models.py:344
    * stops at n_cols−1 masked): inference STARTS from the all-masked
    * input (nothing observed yet), which the reference leaves
    * out-of-distribution and covers by stochastic generalization — a
    * deterministic enumerated fit has no such generalization to lean
    * on, so the full mask joins the training space and the first
    * factor P(col | ∅) is learned, not extrapolated.
    */
  private val maskPatterns: Array[(Int, Double)] = {
    def choose(n: Int, k: Int): Double =
      (1 to k).map(i => (n - i + 1).toDouble / i).product
    (1 until (1 << nPos))
      .map { m =>
        val n = Integer.bitCount(m)
        (m, 1.0 / nPos / choose(nPos, n))
      }
      .toArray
  }

  /** Expected masked-denoising loss over `data` rows (c, o, l, f, w) ×
    * the enumerated mask space; gradients accumulate into `grad` when
    * non-null. Loss per (combo, mask) = Σ_{i∈mask} −log P̂_i(t_i) /
    * |mask| (models.py:322 nll_masked), weighted by the combo weight
    * and the mask's draw probability.
    */
  def lossAndGrad(data: Array[(Int, Int, Int, Int, Double)],
      grad: Array[Double]): Double = {
    val p = params
    var loss = 0.0
    val wTot = data.map(_._5).sum
    val ps = fwdPass
    val dz = new Array[Double](nPos * d)
    val dy = new Array[Double](nPos * d)
    val dctx = new Array[Double](nPos * d)
    val dq = new Array[Double](nPos * d)
    val dk = new Array[Double](nPos * d)
    val dv = new Array[Double](nPos * d)
    val dx = new Array[Double](nPos * d)
    val du = new Array[Double](h)
    val t = new Array[Int](nPos)
    data.foreach { case (c0, o0, l0, f0, w) =>
      t(0) = c0; t(1) = o0; t(2) = l0; t(3) = f0
      maskPatterns.foreach { case (mask, pw) =>
        val nm = Integer.bitCount(mask)
        val ws = w / wTot * pw / nm
        val probs = forward(t, mask, ps)
        var i = 0
        while (i < nPos) {
          if ((mask & (1 << i)) != 0)
            loss -= ws * math.log(math.max(probs(i)(t(i)), 1e-300))
          i += 1
        }
        if (grad != null) {
          java.util.Arrays.fill(dz, 0.0); java.util.Arrays.fill(dy, 0.0)
          java.util.Arrays.fill(dctx, 0.0); java.util.Arrays.fill(dq, 0.0)
          java.util.Arrays.fill(dk, 0.0); java.util.Arrays.fill(dv, 0.0)
          java.util.Arrays.fill(dx, 0.0)
          // heads: only MASKED positions carry loss (models.py:327)
          i = 0
          while (i < nPos) {
            if ((mask & (1 << i)) != 0) {
              val xb = i * d
              val (uo, bo) = headOff(i)
              var r = 0
              while (r < vocab(i)) {
                val dl = ws * (probs(i)(r) - (if (r == t(i)) 1.0 else 0.0))
                grad(bo + r) += dl
                var cc = 0; val base = uo + r * d
                while (cc < d) {
                  grad(base + cc) += dl * ps.z(xb + cc)
                  dz(xb + cc) += p(base + cc) * dl
                  cc += 1
                }
                r += 1
              }
            }
            i += 1
          }
          // FFN backward
          i = 0
          while (i < nPos) {
            val xb = i * d
            var c = 0
            while (c < d) {
              grad(off(12) + c) += dz(xb + c); dy(xb + c) += dz(xb + c); c += 1
            }
            java.util.Arrays.fill(du, 0.0)
            var r = 0
            while (r < d) {
              val dzr = dz(xb + r); val base = off(11) + r * h
              var cc = 0
              while (cc < h) {
                grad(base + cc) += dzr * ps.u(i * h + cc)
                du(cc) += p(base + cc) * dzr
                cc += 1
              }
              r += 1
            }
            r = 0
            while (r < h) {
              val g = if (ps.u(i * h + r) > 0.0) du(r) else 0.0
              grad(off(10) + r) += g
              val base = off(9) + r * d
              var cc = 0
              while (cc < d) {
                grad(base + cc) += g * ps.y(xb + cc)
                dy(xb + cc) += p(base + cc) * g
                cc += 1
              }
              r += 1
            }
            i += 1
          }
          // attention backward (full, non-causal)
          i = 0
          while (i < nPos) {
            val xb = i * d
            var c = 0
            while (c < d) { dx(xb + c) += dy(xb + c); c += 1 }
            mvGrad(p, grad, off(8), d, d, ps.ctx, xb, dy, xb, dctx, xb)
            val da = new Array[Double](nPos)
            var j = 0
            while (j < nPos) {
              var acc = 0.0; c = 0
              while (c < d) {
                dv(j * d + c) += ps.a(i * nPos + j) * dctx(xb + c)
                acc += ps.v(j * d + c) * dctx(xb + c)
                c += 1
              }
              da(j) = acc
              j += 1
            }
            var dot = 0.0; j = 0
            while (j < nPos) { dot += ps.a(i * nPos + j) * da(j); j += 1 }
            j = 0
            while (j < nPos) {
              val dsj = ps.a(i * nPos + j) * (da(j) - dot) * scale
              c = 0
              while (c < d) {
                dq(xb + c) += dsj * ps.k(j * d + c)
                dk(j * d + c) += dsj * ps.q(xb + c)
                c += 1
              }
              j += 1
            }
            i += 1
          }
          // projections and embeddings (masked inputs have no emb grad)
          i = 0
          while (i < nPos) {
            val xb = i * d
            mvGrad(p, grad, off(5), d, d, ps.x, xb, dq, xb, dx, xb)
            mvGrad(p, grad, off(6), d, d, ps.x, xb, dk, xb, dx, xb)
            mvGrad(p, grad, off(7), d, d, ps.x, xb, dv, xb, dx, xb)
            val masked = (mask & (1 << i)) != 0
            var c = 0
            while (c < d) {
              grad(off(0) + i * d + c) += dx(xb + c)
              if (!masked) grad(embOff(i, t(i)) + c) += dx(xb + c)
              c += 1
            }
            i += 1
          }
        }
      }
    }
    loss
  }

  /** Deterministic full-batch Adam (the AR leg's optimizer). */
  def fit(data: Array[(Int, Int, Int, Int, Double)], steps: Int,
      lr: Double = 0.01): NarMlm = {
    val g = new Array[Double](nParams)
    val m = new Array[Double](nParams)
    val v = new Array[Double](nParams)
    val (b1, b2, eps) = (0.9, 0.999, 1e-8)
    var s = 1
    while (s <= steps) {
      java.util.Arrays.fill(g, 0.0)
      lossAndGrad(data, g)
      val c1 = 1.0 - math.pow(b1, s.toDouble)
      val c2 = 1.0 - math.pow(b2, s.toDouble)
      var i = 0
      while (i < nParams) {
        m(i) = b1 * m(i) + (1 - b1) * g(i)
        v(i) = b2 * v(i) + (1 - b2) * g(i) * g(i)
        params(i) -= lr * (m(i) / c1) / (math.sqrt(v(i) / c2) + eps)
        i += 1
      }
      s += 1
    }
    this
  }

  /** Weighted expected masked NLL under the current parameters. */
  def loss(data: Array[(Int, Int, Int, Int, Double)]): Double =
    lossAndGrad(data, null)

  /** One conditional by the reference's masking trick: mask position i
    * AND every still-unknown position (`unknownMask`), feed the
    * observed codes, read head i. */
  def conditional(i: Int, t: Array[Int], unknownMask: Int): Array[Double] = {
    require((unknownMask & (1 << i)) != 0, "target must be masked")
    forward(t, unknownMask, fwdPass)(i).clone()
  }

  /** Enumerated model joint over the full code cross-product via the
    * chain of masked conditionals P(c)·P(o|c)·P(l|c,o) and
    * einv = E[1/fanout | c,o,l] from the fanout head — the same
    * structural-zero + renormalize construction as the AR legs, so the
    * downstream estimate algebra is shared. */
  def enumerateJoint(): Seq[(Int, Int, Int, Double, Double)] = {
    val t = new Array[Int](nPos)
    val pc = conditional(0, t, 15) // nothing observed: mask {c,o,l,f}
    val po = Array.tabulate(cMax) { c =>
      t(0) = c; conditional(1, t, 14) // observed c: mask {o,l,f}
    }
    val raw = for { c <- 0 until cMax; o <- 0 until oMax } yield {
      t(0) = c; t(1) = o
      val pl = conditional(2, t, 12) // observed c,o: mask {l,f} — l-free
      (0 until lMax).map { l =>
        t(2) = l
        val pf = conditional(3, t, 8) // observed c,o,l: mask {f}
        val praw =
          if (o == 0 && l != 0) 0.0
          else pc(c) * po(c)(o) * pl(l)
        var einv = 0.0
        var f = 0
        while (f < fMax) { einv += pf(f) / (f + 1.0); f += 1 }
        (c + 1, o + 1, l + 1, praw, einv)
      }
    }
    val flat = raw.flatten
    val z = flat.map(_._4).sum
    flat.map { case (c, o, l, praw, einv) => (c, o, l, praw / z, einv) }
  }
}

object NarMlm {
  /** Train with the AR transformer leg's hyperparameters (d=16, h=32);
    * 400 full-batch steps over the enumerated mask space converge the
    * expected masked CE at these domain sizes (each step already
    * averages all 15 masks, so it needs fewer steps than the
    * single-objective AR fit). */
  def train(data: Array[(Int, Int, Int, Int, Double)],
      cMax: Int, oMax: Int, lMax: Int, fMax: Int, seed: Long,
      steps: Int = 400): NarMlm =
    new NarMlm(cMax, oMax, lMax, fMax, 16, 32, seed).fit(data, steps)
}

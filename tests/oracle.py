"""Pure-NumPy DFXP oracle re-deriving the reference semantics
(/root/reference/dynamic_fixed_point.py:4-94) for golden tests."""

import numpy as np


def multiplier(bits, exp):
    return np.float32(2.0) ** np.float32(bits - 1 - exp)


def quantize(x, bits, exp):
    """Deterministic DFXP fake-quant (round-half-even, like tf.round)."""
    if bits >= 32:
        return np.asarray(x, np.float32)
    x = np.asarray(x, np.float32)
    mult = multiplier(bits, exp)
    limit = np.float32(2 ** (bits - 1))
    scaled = np.clip(x * mult, -limit, limit - 1)
    # np.round is round-half-to-even, matching tf.round / jnp.round
    return np.round(scaled).astype(np.float32) / mult


def quantize_stochastic(x, bits, exp, noise):
    """Stochastic path: floor(clip(x*mult + u)) / mult (reference :32-38).
    ``noise`` must be broadcastable to x (the reference draws shape
    x.shape[1:], shared across axis 0)."""
    x = np.asarray(x, np.float32)
    mult = multiplier(bits, exp)
    limit = np.float32(2 ** (bits - 1))
    scaled = np.clip(x * mult + noise, -limit, limit - 1)
    return np.floor(scaled).astype(np.float32) / mult


def overflow_rates(x, bits, exp):
    x = np.asarray(x, np.float32)
    mult = multiplier(bits, exp)
    limit = np.float32(2 ** (bits - 1))
    s = x * mult
    ovf = np.mean((s >= limit) | (s < -limit))
    ovf2 = np.mean((s >= limit / 2) | (s < -limit / 2))
    return np.float32(ovf), np.float32(ovf2)


def update_exponent(exp, ovf, ovf2, bits, target=0.0):
    if ovf > target:
        delta = 1
    elif ovf2 <= target:
        delta = -1
    else:
        delta = 0
    return min(bits - 1, exp + delta)


# ---------------------------------------------------------------------------
# Model-level oracle: an independent NumPy re-derivation of the
# reference's layer semantics — forward, the quantize-the-cotangent
# backward chain, the per-site range controllers, and momentum SGD with
# in-gradient weight decay (VERDICT round-4 missing #2: the repo's
# int8<->sim parity tests are self-referential; this file is the
# executable third opinion).  Deterministic rounding throughout (the
# stochastic floor+U(0,1) path is oracle-tested separately in
# test_quantize.py); semantics re-derived from
# /root/reference/dynamic_fixed_point.py:224-316 (Conv2d_q), :319-470
# (Dense_q), :539-623 (Normalization_q), :626-694 (Rescale_q),
# :983-1006 (ReLU/MaxPool), models.py:47-51 (backward seeding),
# trainer.py:79-84 (MomentumOptimizer).
# ---------------------------------------------------------------------------


class _Site:
    """One quantization site: exponent state + deferred controller step.

    The reference measures overflow of the PRE-quant tensor at the
    CURRENT exponent and assigns the +/-1 step so the NEXT step's
    quantize sees it (dynamic_fixed_point.py:40-41, :70-94; the
    single-session.run of trainer.py:157 reads variables before the
    assigns land)."""

    def __init__(self, bits, exp=2):
        self.bits = bits
        self.exp = exp
        self._pending = None

    def quantize(self, x):
        if self.bits >= 32:
            return np.asarray(x, np.float32)
        ovf, ovf2 = overflow_rates(x, self.bits, self.exp)
        self._pending = update_exponent(self.exp, ovf, ovf2, self.bits)
        return quantize(x, self.bits, self.exp)

    def commit(self):
        if self._pending is not None:
            self.exp = self._pending
            self._pending = None


def _conv_fwd(x, w, stride, pads):
    b, h, wd, ci = x.shape
    kh, kw, _, co = w.shape
    (plh, phh), (plw, phw) = pads
    xp = np.pad(x, ((0, 0), (plh, phh), (plw, phw), (0, 0)))
    ho = (h + plh + phh - kh) // stride + 1
    wo = (wd + plw + phw - kw) // stride + 1
    y = np.zeros((b, ho, wo, co), np.float32)
    for i in range(kh):
        for j in range(kw):
            xs = xp[:, i:i + stride * ho:stride, j:j + stride * wo:stride]
            y += np.einsum("bhwc,cd->bhwd", xs, w[i, j],
                           dtype=np.float32)
    return y


def _conv_bwd(x, w, g, stride, pads):
    """(dx, dw) of _conv_fwd at (x, w) with cotangent g."""
    b, h, wd, ci = x.shape
    kh, kw, _, co = w.shape
    (plh, phh), (plw, phw) = pads
    xp = np.pad(x, ((0, 0), (plh, phh), (plw, phw), (0, 0)))
    ho, wo = g.shape[1:3]
    dxp = np.zeros_like(xp)
    dw = np.zeros_like(w)
    for i in range(kh):
        for j in range(kw):
            xs = xp[:, i:i + stride * ho:stride, j:j + stride * wo:stride]
            dw[i, j] = np.einsum("bhwc,bhwd->cd", xs, g, dtype=np.float32)
            dxp[:, i:i + stride * ho:stride,
                j:j + stride * wo:stride] += np.einsum(
                    "bhwd,cd->bhwc", g, w[i, j], dtype=np.float32)
    return dxp[:, plh:plh + h, plw:plw + wd], dw


def _same_pads(size, k, stride):
    out = -(-size // stride)
    total = max((out - 1) * stride + k - size, 0)
    lo = total // 2
    return (lo, total - lo)


class RefConv2d:
    """Conv2d_q: X at bits+1, W/b at bits, grad at bits
    (dynamic_fixed_point.py:287-305)."""

    def __init__(self, W, b, stride, padding, bits, weight_decay):
        self.W, self.b = W, b
        self.stride = stride
        self.padding = padding
        self.wd = weight_decay
        self.sx = _Site(bits + 1 if bits < 32 else 32)
        self.sw = _Site(bits)
        self.sb = _Site(bits) if b is not None else None
        self.sg = _Site(bits)
        self.params = {"W": lambda: self.W, "b": lambda: self.b}

    def _pads(self, x):
        if self.padding == "SAME":
            return (_same_pads(x.shape[1], self.W.shape[0], self.stride),
                    _same_pads(x.shape[2], self.W.shape[1], self.stride))
        return ((0, 0), (0, 0))

    def forward(self, x, train):
        self.x_shape = x.shape
        self.xq = self.sx.quantize(x)
        self.wq = self.sw.quantize(self.W)
        self.pads = self._pads(x)
        y = _conv_fwd(self.xq, self.wq, self.stride, self.pads)
        if self.b is not None:
            y = y + self.sb.quantize(self.b)
        return y

    def backward(self, g):
        gq = self.sg.quantize(g)
        dx, dW = _conv_bwd(self.xq, self.wq, gq, self.stride, self.pads)
        self.dW = dW + 2.0 * self.wd * self.W
        if self.b is not None:
            self.db = gq.sum(axis=(0, 1, 2))
        return dx

    def sgd(self, lr, mom, vel):
        vel["W"] = mom * vel.get("W", 0.0) + self.dW
        self.W = self.W - lr * vel["W"]
        if self.b is not None:
            vel["b"] = mom * vel.get("b", 0.0) + self.db
            self.b = self.b - lr * vel["b"]

    def sites(self):
        s = {"x": self.sx, "w": self.sw, "grad": self.sg}
        if self.sb is not None:
            s["b"] = self.sb
        return s


class RefDense:
    """Dense_q: X and W at bits (no +1), grad at bits
    (dynamic_fixed_point.py:384-388, :441-460)."""

    def __init__(self, W, b, bits, weight_decay):
        self.W, self.b = W, b
        self.wd = weight_decay
        self.sx = _Site(bits)
        self.sw = _Site(bits)
        self.sb = _Site(bits) if b is not None else None
        self.sg = _Site(bits)

    def forward(self, x, train):
        self.xq = self.sx.quantize(x)
        self.wq = self.sw.quantize(self.W)
        y = self.xq @ self.wq
        if self.b is not None:
            y = y + self.sb.quantize(self.b)
        return y

    def backward(self, g):
        gq = self.sg.quantize(g)
        self.dW = self.xq.T @ gq + 2.0 * self.wd * self.W
        if self.b is not None:
            self.db = gq.sum(axis=0)
        return gq @ self.wq.T

    sgd = RefConv2d.sgd
    sites = RefConv2d.sites


class RefNorm:
    """Normalization_q: quantize X, batch moments OF THE QUANTIZED
    tensor, normalize; EMA 0.999 running stats; mean/var themselves
    unquantized; backward quantizes the cotangent then VJPs through the
    moments (dynamic_fixed_point.py:584-623)."""

    def __init__(self, num_features, bits, momentum=0.999, eps=1e-5):
        self.momentum = momentum
        self.eps = eps
        self.run_mean = np.zeros(num_features, np.float32)
        self.run_var = np.ones(num_features, np.float32)
        self.sx = _Site(bits)
        self.sg = _Site(bits)

    def forward(self, x, train):
        self.xq = self.sx.quantize(x)
        axes = tuple(range(x.ndim - 1))
        mean_b = self.xq.mean(axes)
        var_b = ((self.xq - mean_b) ** 2).mean(axes)  # biased, tf.nn.moments
        if train:
            self.mean, self.var = mean_b, var_b
            m = self.momentum
            self.run_mean = m * self.run_mean + (1 - m) * mean_b
            self.run_var = m * self.run_var + (1 - m) * var_b
        else:
            self.mean, self.var = self.run_mean, self.run_var
        self.sigma = np.sqrt(self.var + self.eps)
        self.y = (self.xq - self.mean) / self.sigma
        return self.y

    def backward(self, g):
        gq = self.sg.quantize(g)
        # batch-norm (no affine) backward wrt xq; STE identity to x.
        axes = tuple(range(gq.ndim - 1))
        n = float(np.prod([gq.shape[a] for a in axes]))
        gm = gq.mean(axes)
        gym = (gq * self.y).mean(axes)
        return (gq - gm - self.y * gym) / self.sigma

    def sgd(self, lr, mom, vel):
        pass

    def sites(self):
        return {"x": self.sx, "grad": self.sg}


class RefRescale:
    """Rescale_q: y = Xq*gq + bq; wd on gamma NOT beta
    (dynamic_fixed_point.py:677-691)."""

    def __init__(self, gamma, beta, bits, weight_decay):
        self.gamma, self.beta = gamma, beta
        self.wd = weight_decay
        self.sx = _Site(bits)
        self.sgam = _Site(bits)
        self.sbet = _Site(bits)
        self.sg = _Site(bits)

    def forward(self, x, train):
        self.xq = self.sx.quantize(x)
        self.gq = self.sgam.quantize(self.gamma)
        self.bq = self.sbet.quantize(self.beta)
        return self.xq * self.gq + self.bq

    def backward(self, g):
        gq = self.sg.quantize(g)
        axes = tuple(range(gq.ndim - 1))
        self.dgamma = (gq * self.xq).sum(axes) + 2.0 * self.wd * self.gamma
        self.dbeta = gq.sum(axes)
        return gq * self.gq

    def sgd(self, lr, mom, vel):
        vel["g"] = mom * vel.get("g", 0.0) + self.dgamma
        self.gamma = self.gamma - lr * vel["g"]
        vel["b"] = mom * vel.get("b", 0.0) + self.dbeta
        self.beta = self.beta - lr * vel["b"]

    def sites(self):
        return {"x": self.sx, "g": self.sgam, "b": self.sbet,
                "grad": self.sg}


class RefReLU:
    """tf.maximum(0.0, X): forward max, backward g * (X > 0) — TF's
    MaximumGrad first-arg-wins tie rule gives ZERO cotangent at exact 0
    (dynamic_fixed_point.py:983-990)."""

    def forward(self, x, train):
        self.x = x
        return np.maximum(x, 0.0)

    def backward(self, g):
        return g * (self.x > 0)

    def sgd(self, lr, mom, vel):
        pass

    def sites(self):
        return {}


class RefMaxPool:
    """tf.nn.max_pool VALID; backward routes the cotangent to the
    first maximum of each window (TF MaxPoolGrad scan order)."""

    def __init__(self, k, stride):
        self.k, self.stride = k, stride

    def forward(self, x, train):
        self.x = x
        b, h, w, c = x.shape
        ho = (h - self.k) // self.stride + 1
        wo = (w - self.k) // self.stride + 1
        windows = np.empty((b, ho, wo, self.k * self.k, c), x.dtype)
        for i in range(self.k):
            for j in range(self.k):
                windows[:, :, :, i * self.k + j] = x[
                    :, i:i + self.stride * ho:self.stride,
                    j:j + self.stride * wo:self.stride]
        self.arg = windows.argmax(axis=3)
        self.out_shape = (b, ho, wo, c)
        return windows.max(axis=3)

    def backward(self, g):
        b, ho, wo, c = self.out_shape
        dx = np.zeros_like(self.x)
        for i in range(self.k):
            for j in range(self.k):
                sel = self.arg == (i * self.k + j)
                dx[:, i:i + self.stride * ho:self.stride,
                   j:j + self.stride * wo:self.stride] += g * sel
        return dx

    def sgd(self, lr, mom, vel):
        pass

    def sites(self):
        return {}


class RefFlatten:
    def forward(self, x, train):
        self.shape = x.shape
        return x.reshape(x.shape[0], -1)

    def backward(self, g):
        return g.reshape(self.shape)

    def sgd(self, lr, mom, vel):
        pass

    def sites(self):
        return {}


class RefModel:
    """The reference training semantics end-to-end: forward chain, mean
    softmax-CE loss seed (models.py:27-32, :47-51), reversed
    quantize-the-cotangent backward, controller commits, momentum SGD
    with in-gradient weight decay."""

    def __init__(self, layers):
        self.layers = layers
        self.vel = [dict() for _ in layers]

    def forward(self, x, train=True):
        for lyr in self.layers:
            x = lyr.forward(np.asarray(x, np.float32), train)
        if not train:
            # eval never runs the controllers (reference trainer.py:177)
            for lyr in self.layers:
                for site in lyr.sites().values():
                    site._pending = None
        return x

    def loss_and_seed(self, logits, labels):
        z = logits - logits.max(axis=-1, keepdims=True)
        ez = np.exp(z)
        p = ez / ez.sum(axis=-1, keepdims=True)
        n = logits.shape[0]
        ll = z[np.arange(n), labels] - np.log(ez.sum(axis=-1))
        onehot = np.zeros_like(p)
        onehot[np.arange(n), labels] = 1.0
        return -ll.mean(), (p - onehot) / n

    def train_step(self, x, y, lr, momentum=0.9):
        logits = self.forward(x, train=True)
        loss, g = self.loss_and_seed(logits, y)
        for lyr in reversed(self.layers):
            g = lyr.backward(g)
        for lyr, vel in zip(self.layers, self.vel):
            lyr.sgd(lr, momentum, vel)
            for site in lyr.sites().values():
                site.commit()
        return loss, logits

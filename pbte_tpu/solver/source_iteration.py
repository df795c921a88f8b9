"""Source-iteration PBTE solver with batched wavefront sweeps (the hot path).

TPU-native redesign of pbte::PBTESolver (ref: src/PBTESolver.cpp:208-332).
The reference's inner loops — for each (direction, branch, band): visit
elements in upwind order, assemble a DOF-sized rhs, per-element dense LU
solve — become:

  vmap over direction-GROUPS (shared upwind DAG):       # <= 2^dim groups
      lax.scan over wavefront LEVELS:                   # O(ne^(1/dim)) steps
          one batched level step over
          (Km directions) x (BS bands) x (W elements):  # big batched GEMMs
            rhs   = a_bs * (M^T Tc_e) + b_bs * (M^T u_e)
                    - sum_f vg*min(s.n, 0) * (C_ef u_nbr | (C/Omega) Tbc If)
            u_e   = A_inv[k, bs, e] @ rhs
          scatter into u

TPU-specific design decisions (each backed by on-chip measurements):

1. SLOT-MAJOR ordinate storage: u is (G, Km, BS, D, ne_pad) where slot (g, k)
   holds direction plan.dirs_of_group[g][k] (padded slots carry zero weight in
   every reduction). No direction gather/scatter in the hot loop; the Km axis
   is the device-sharding axis ("ordinate data parallelism", SURVEY section 2.3).

2. LEVEL-CONTIGUOUS element ordering: within each group, elements are
   permuted into concatenated wavefront-level order (level l occupies columns
   [offset_l, offset_l + count_l), total exactly ne — no interspersed
   padding). Per-level operator access is a lax.dynamic_slice of static width
   W_max at the (clamped) level offset; slots outside the level compute
   garbage that the masked write-back discards (slots before the offset are
   already-final earlier-level values which the mask preserves; slots after
   belong to later levels and are overwritten by their own step). Measured on
   TPU v5e for the flagship shape: arbitrary-index gathers on the minor axis
   of the 2.25 GB A^-1 ran at ~6 GB/s (761 ms/step); the sliced layout runs
   at full-pass speed (~90 ms including the solve einsums). Only the
   per-level neighbor read remains a (small) gather.

3. ELEMENT-LAST device layout: operator tensors keep the element axis
   minor-most — (D, D, ne), (G, Km, BS, D, D, ne) — so XLA's (8, 128) tiling
   pads the large ne axis instead of the small D axis. The (..., D, D) layout
   with D=27 padded 5.6x and OOMed a 16 GB chip at 39 GB during batched
   inversion; element-last keeps padding ~1.2-1.4x.

4. Operator tensors travel as jit ARGUMENTS (self.consts pytree), never as
   captured closure constants (constants are baked into the lowered HLO —
   GBs shipped through compilation for production shapes).

5. A^-1 is precomputed on HOST in chunked batched float64 LAPACK (the
   CachePolicy::FullLU analog) and shipped element-last in level order;
   "per-iteration" recomputes it on device each sweep (the OnTheFly analog
   for memory-constrained shapes).

Operator (ref: src/PBTESolver.cpp:146-168), scaled by 1/dt_inv (exact
non-dimensionalization; keeps coefficients O(1) so f32 is stable):
    A~ = M + (vg/dt_inv) * G[k,e],
    G  = -sum_d s_d S_d + sum_f max(s.n_f, 0) * Mf,
    dt_inv = max invKn over all bands (ref: src/PBTESolver.cpp:39-47).

Semantics preserved exactly (SURVEY.md section 2.4): Gauss-Seidel in space
within a sweep (upwind neighbors live in strictly earlier levels), lagged Tc
between outer iterations, inflow factor 0.5*vg*(s.n-|s.n|) == vg*min(s.n,0),
residual on cell-average Tv.

Parity evidence: with face_mode="mfem-parity" assembly, the 2D demo
(unit-square-iso, p=1, 24 dirs, 2x20 bands, 101 iterations) reproduces the
reference's committed Tc_all.txt and coeff_all.txt byte-for-byte at %g
precision and T_slice.txt to 2.5e-15.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from pbte_tpu.models import macroscopic
from pbte_tpu.sweep import planner


class SourceIterationSolver:
    """Build once per (mesh, angles, material, bcs) problem; jitted step."""

    def __init__(
        self,
        ops,  # fem.assembly.ElementOps
        quad,  # angular.quadrature.AngularQuad
        tables,  # material.nongray_smrt.PhononTables
        bc_temps: dict,  # boundary attr -> temperature deviation
        dtype=None,
        cache_policy: str = "full",  # "full" | "per-iteration"
        require_bcs: bool = True,
        dir_sharding=None,  # optional jax.sharding.NamedSharding for the Km axis
        use_pallas: bool = False,  # Pallas kernel for the level solve
        scan_unroll: int = 1,  # unroll factor for the level scan
    ):
        import jax
        import jax.numpy as jnp

        if dtype is None:
            dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        self.dtype = dtype
        np_dtype = np.dtype(dtype.dtype if hasattr(dtype, "dtype") else dtype)
        if cache_policy == "per-iteration":
            cache_policy = "on-the-fly"  # back-compat alias
        if cache_policy not in ("full", "on-the-fly", "eigen"):
            raise ValueError(f"unknown cache_policy: {cache_policy}")
        self.cache_policy = cache_policy
        self.use_pallas = use_pallas
        self.scan_unroll = scan_unroll

        self.ne = ne = ops.num_elements
        self.D = D = ops.ndof
        self.nf = nf = ops.faces_per_elem
        self.dim = ops.dim
        self.K = quad.num_directions
        self.BS = BS = tables.num_branches * tables.num_spectral
        self.num_branches = tables.num_branches
        self.omega = quad.total_weight
        self.quad = quad

        # flat band tables (float64 host math)
        inv_kn = tables.flat("inv_kn").astype(np.float64)
        vg = tables.flat("vg").astype(np.float64)
        heat_cap = tables.flat("heat_cap").astype(np.float64)
        self.dt_inv = float(inv_kn.max())

        # Boundary sanity: the serial reference asserts every boundary face has
        # an isothermal entry (ref: src/PBTESolver.cpp:286).
        bdry_attrs = set(int(a) for a in np.unique(ops.face_attr[ops.neighbor < 0]))
        missing = bdry_attrs - set(int(k) for k in bc_temps)
        if missing and require_bcs:
            raise ValueError(
                f"boundary attributes without isothermal BC: {sorted(missing)}"
            )
        bc_T = np.zeros((ne, nf))
        for attr, T in bc_temps.items():
            bc_T[ops.face_attr == int(attr)] = float(T)

        # ---- sweep plan, slot-major (G, Km) layout -------------------------
        plan = planner.build_plan(ops.neighbor, ops.normals, quad.directions)
        self.plan = plan
        G = plan.num_groups
        Km = max(len(d) for d in plan.dirs_of_group)
        if dir_sharding is not None:
            ndev = int(np.prod([dir_sharding.mesh.shape[a]
                                for a in dir_sharding.spec if a is not None])) or 1
            Km = -(-Km // ndev) * ndev
        dirs_pad = np.full((G, Km), -1, dtype=np.int64)
        for g, d in enumerate(plan.dirs_of_group):
            dirs_pad[g, : len(d)] = d
        self.dirs_pad = dirs_pad  # slot (g,k) -> global dir or -1
        self.G, self.Km = G, Km
        dir_valid = dirs_pad >= 0
        dirs_np = quad.directions[:, : self.dim]
        dirs_safe = np.where(dir_valid, dirs_pad, 0)

        # ---- compact level-concatenated element ordering per group ----------
        # perm[g] = concatenation of level member lists (length exactly ne);
        # level l occupies positions [offsets[g,l], offsets[g,l]+counts[g,l])
        self.L = L = plan.max_levels
        self.W = W = min(plan.max_width, ne)
        self.ne_pad = ne_pad = ne  # compact: no interspersed padding
        perm = np.empty((G, ne), dtype=np.int64)
        counts = np.zeros((G, L), dtype=np.int32)
        offsets = np.zeros((G, L), dtype=np.int32)
        for g in range(G):
            pos = 0
            for l in range(L):
                row = plan.levels[g, l]
                elems = row[row >= 0]
                counts[g, l] = len(elems)
                offsets[g, l] = pos
                perm[g, pos : pos + len(elems)] = elems
                pos += len(elems)
            assert pos == ne
        perm_safe = perm
        # inverse: position of global element e in group-g order
        pos_of_elem = np.zeros((G, ne), dtype=np.int32)
        for g in range(G):
            pos_of_elem[g, perm[g]] = np.arange(ne)
        self._perm = perm
        self._offsets = offsets
        self._counts = counts

        # neighbor positions per group: (G, nf, ne), -1 for boundary
        nbr = ops.neighbor  # (ne, nf)
        nbr_g = nbr[perm]  # (G, ne, nf)
        nbr_pos = np.where(
            nbr_g >= 0,
            np.take_along_axis(
                pos_of_elem, np.clip(nbr_g, 0, None).reshape(G, -1), axis=1
            ).reshape(G, ne, nf),
            -1,
        )
        nbr_pos = np.swapaxes(nbr_pos, 1, 2)  # (G, nf, ne)

        def gperm(a, extra_axes=None):
            """a (ne, ...) -> (G, ..., ne) in group order."""
            return np.moveaxis(a[perm], 1, -1)

        mass_t_g = gperm(np.swapaxes(ops.mass, -1, -2), None)  # (G, D, D, ne_pad)
        face_int_g = gperm(ops.face_int, None)  # (G, nf, D, ne_pad)
        coupling_g = gperm(ops.coupling, None)  # (G, nf, D, D, ne_pad)
        bc_T_g = gperm(bc_T, None)  # (G, nf, ne_pad)
        basis_int_g = gperm(ops.basis_int, None)  # (G, D, ne_pad)

        fdot = np.einsum(
            "gefd,gkd->gkfe", ops.normals[perm_safe], dirs_np[dirs_safe]
        )  # (G, Km, nf, ne_pad)

        self._dir_sharding = dir_sharding
        pos_valid = np.ones((G, ne), dtype=bool)  # compact layout: all real
        put = lambda a: jax.device_put(np.ascontiguousarray(a, dtype=np_dtype))
        iput = lambda a: jax.device_put(np.ascontiguousarray(a, dtype=np.int32))

        def sput(a, dt=np_dtype):
            a = np.ascontiguousarray(a, dtype=dt)
            if dir_sharding is None:
                return jax.device_put(a)
            return jax.device_put(a, self._slot_sharding(a))

        # ---- transport operator (host, float64, chunked batched inverse) ---
        vg_s = vg / self.dt_inv  # non-dimensionalized group velocity
        stiff_g = ops.stiff[perm]  # (G, ne, dim, D, D)
        fmass_g = ops.face_mass[perm]  # (G, ne, nf, D, D)
        mass_g = ops.mass[perm]  # (G, ne, D, D)

        if cache_policy == "full":
            a_inv = np.empty((G, Km, BS, D, D, ne), dtype=np_dtype)
            for g in range(G):
                G_g = -np.einsum(
                    "kd,edij->keij", dirs_np[dirs_safe[g]], stiff_g[g]
                ) + np.einsum(
                    "kfe,efij->keij", np.maximum(fdot[g], 0.0), fmass_g[g]
                )
                A_g = (
                    mass_g[g][None, None]
                    + vg_s[None, :, None, None, None] * G_g[:, None]
                )  # (Km, BS, ne, D, D)
                a_inv[g] = np.moveaxis(np.linalg.inv(A_g), 2, -1).astype(np_dtype)
            mats = sput(a_inv)
            del a_inv
        elif cache_policy == "eigen":
            # Eigendecomposition compression: A(vg) = M (I + vg C) with
            # C = M^-1 G = V diag(lam) V^-1, so
            #   A^-1(vg) = V diag(1/(1 + vg lam)) (V^-1 M^-1)
            # The factors are BAND-INDEPENDENT: storage/transfer shrink ~10x
            # (2 complex D x D per (dir, elem) instead of BS real ones) and
            # the decomposition count shrinks BS-fold. Measured eigenvector
            # conditioning is benign (cond(V) ~ 1e2) and f64 reconstruction
            # error ~1e-14 on flagship operators; the complex pair structure
            # costs 4x flops on the apply, amortized by the 10x less HBM.
            # complex arithmetic is split into real/imaginary parts (this
            # TPU backend lacks complex einsum)
            P = np.empty((G, Km, 2, D, D, ne), dtype=np_dtype)
            Qm = np.empty((G, Km, 2, D, D, ne), dtype=np_dtype)
            lam = np.empty((G, Km, 2, D, ne), dtype=np_dtype)
            for g in range(G):
                Minv_g = np.linalg.inv(mass_g[g])  # (ne, D, D)
                for k in range(Km):
                    G_k = -np.einsum(
                        "d,edij->eij", dirs_np[dirs_safe[g, k]], stiff_g[g]
                    ) + np.einsum(
                        "fe,efij->eij", np.maximum(fdot[g, k], 0.0), fmass_g[g]
                    )
                    C = Minv_g @ G_k  # (ne, D, D)
                    w, V = np.linalg.eig(C)  # batched complex
                    Vinv = np.linalg.inv(V)
                    Q_c = Vinv @ Minv_g
                    P[g, k, 0] = V.real.transpose(1, 2, 0)
                    P[g, k, 1] = V.imag.transpose(1, 2, 0)
                    Qm[g, k, 0] = Q_c.real.transpose(1, 2, 0)
                    Qm[g, k, 1] = Q_c.imag.transpose(1, 2, 0)
                    lam[g, k, 0] = w.real.T
                    lam[g, k, 1] = w.imag.T
            mats = (jax.device_put(P), jax.device_put(Qm), jax.device_put(lam))
        else:
            G_mat = np.empty((G, Km, D, D, ne))
            for g in range(G):
                G_g = -np.einsum(
                    "kd,edij->keij", dirs_np[dirs_safe[g]], stiff_g[g]
                ) + np.einsum(
                    "kfe,efij->keij", np.maximum(fdot[g], 0.0), fmass_g[g]
                )
                G_mat[g] = G_g.transpose(0, 2, 3, 1)
            mats = sput(G_mat)

        # ---- device constants ------------------------------------------------
        # slot-shaped macroscopic weights; padded slots weigh zero
        mw = macroscopic.macro_weights(quad, tables)  # (K, BS)
        mw_slots = np.where(dir_valid[..., None], mw[dirs_safe], 0.0)
        fw = macroscopic.flux_weights(quad, tables, self.dim)  # (dim, K, BS)
        fw_slots = np.where(
            dir_valid[None, ..., None],
            fw[:, dirs_safe.reshape(-1)].reshape(self.dim, G, Km, BS),
            0.0,
        )

        self.consts = dict(
            mass_t=put(mass_t_g),  # (G, D, D, ne_pad): Mt[g,i,j,p]=mass[e_p,j,i]
            mass=put(np.moveaxis(mass_g, 1, -1)),  # (G, D, D, ne_pad)
            basis_int=put(basis_int_g),  # (G, D, ne_pad)
            basis_int_glob=put(ops.basis_int),  # (ne, D) global layout
            face_int=put(face_int_g),  # (G, nf, D, ne_pad)
            coupling=put(coupling_g),  # (G, nf, D, D, ne_pad)
            nbr_pos=iput(nbr_pos),  # (G, nf, ne_pad), -1 bdry/pad
            bc_T=put(bc_T_g),  # (G, nf, ne_pad)
            pos_of_elem=iput(pos_of_elem),  # (G, ne)
            perm=iput(perm),  # (G, ne): global elem at position
            offsets=iput(offsets),  # (G, L) level start positions
            counts=iput(counts),  # (G, L) level widths
            vg=put(vg_s),
            src_w=put(inv_kn * heat_cap / (self.omega * self.dt_inv)),
            relax_w=put(1.0 - inv_kn / self.dt_inv),
            bc_w=put(heat_cap / self.omega),
            macro_w=sput(mw_slots),  # (G, Km, BS)
            flux_w=sput(np.moveaxis(fw_slots, 0, -1)),  # (G, Km, BS, dim)
            fdot=sput(fdot),  # (G, Km, nf, ne_pad)
            mats=mats,
        )
        self._step = jax.jit(self._step_impl)

    def _slot_sharding(self, a):
        """NamedSharding for a slot-major array: shard axis 1 (Km)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        spec = [None] * a.ndim
        spec[1] = self._dir_sharding.spec[0] if hasattr(
            self._dir_sharding, "spec") else "dir"
        return NamedSharding(self._dir_sharding.mesh, P(*spec))

    # -- state -------------------------------------------------------------

    def initial_state(self):
        """Zero coefficients/Tc/Tv (ref: PBTESolver::CreateInitialCoefficients)."""
        import jax
        import jax.numpy as jnp

        shape = (self.G, self.Km, self.BS, self.D, self.ne_pad)
        if self._dir_sharding is not None:
            u = jax.device_put(
                jnp.zeros(shape, dtype=self.dtype),
                self._slot_sharding(np.empty(shape)),
            )
        else:
            u = jnp.zeros(shape, dtype=self.dtype)
        Tc = jnp.zeros((self.ne, self.D), dtype=self.dtype)
        Tv = jnp.zeros((self.ne,), dtype=self.dtype)
        return u, Tc, Tv

    # -- one outer iteration ----------------------------------------------

    def _level_a_inv(self, c, mass_l, g_mat_l):
        """On-the-fly A^-1 for ONE level's elements (OnTheFly analog, done the
        TPU way: invert only the (Km, BS, W) blocks inside the scan body, so
        nothing is stored — ~40x less memory than the full cache at D^3/D^2
        extra flops per step, which the MXU absorbs on bandwidth-bound shapes).

        mass_l (D, D, W), g_mat_l (Km, D, D, W) -> (Km, BS, D, D, W)."""
        import jax.numpy as jnp

        A = (
            jnp.moveaxis(mass_l, -1, 0)[None, None]
            + c["vg"][None, :, None, None, None]
            * jnp.moveaxis(g_mat_l, -1, 1)[:, None]
        )  # (Km, BS, W, D, D)
        return jnp.moveaxis(jnp.linalg.inv(A), 2, -1)

    def _step_impl(self, c, u, Tc, Tv_prev):
        import jax
        import jax.numpy as jnp
        from jax import lax

        G, W, L, nf, D = self.G, self.W, self.L, self.nf, self.D

        TcT = Tc.T  # (D, ne)

        ne = self.ne

        def _write(u_g, sol, offc):
            return lax.dynamic_update_slice_in_dim(u_g, sol, offc, axis=-1)

        def sweep_group(u_g, TcT_g, mass_t, face_int, coupling, nbr_pos, bc_T,
                        fdot, mats, g_mass, offsets_g, counts_g):
            # u_g (Km, BS, D, ne); compact group-level-concatenated order
            iota = jnp.arange(W)

            def level_body(u_g, oc):
                off, count = oc
                # clamp so the static-width window stays in bounds; slots
                # outside [off, off+count) compute garbage that the masked
                # write-back discards (earlier-level slots keep their final
                # values; later-level slots are rewritten by their own step)
                offc = jnp.minimum(off, ne - W)
                shift = off - offc  # first `shift` slots belong to levels < l
                sl = lambda a: lax.dynamic_slice_in_dim(a, offc, W, axis=-1)
                Mt = sl(mass_t)  # (D, D, W)
                t_tc = jnp.einsum("ijw,jw->iw", Mt, sl(TcT_g))
                u_e = sl(u_g)  # (Km, BS, D, W)
                t_old = jnp.einsum("ijw,kbjw->kbiw", Mt, u_e)
                rhs = (
                    c["src_w"][None, :, None, None] * t_tc[None, None]
                    + c["relax_w"][None, :, None, None] * t_old
                )  # (Km, BS, D, W)
                # all faces fused: ONE neighbor gather + ONE coupling einsum
                npos = sl(nbr_pos)  # (nf, W) neighbor position or -1
                is_b = npos < 0  # boundary
                u_nbr = u_g[:, :, :, jnp.where(is_b, 0, npos)]  # (Km, BS, D, nf, W)
                cin = jnp.minimum(sl(fdot), 0.0)  # (Km, nf, W) inflow factor / vg
                cin_int = jnp.where(is_b[None], 0.0, cin)
                cin_bnd = jnp.where(is_b[None], cin, 0.0)
                # interior inflow: sum_f cin_f * (C_f u_nbr_f)
                interior = jnp.einsum(
                    "fijw,kfw,kbjfw->kbiw", sl(coupling), cin_int, u_nbr
                )  # (Km, BS, D, W)
                # boundary inflow: sum_f cin_f * Tbc_f * If (band factor bc_w)
                bsrc = jnp.einsum(
                    "kfw,fw,fiw->kiw", cin_bnd, sl(bc_T), sl(face_int)
                )  # (Km, D, W)
                rhs = rhs - c["vg"][None, :, None, None] * (
                    interior + c["bc_w"][None, :, None, None] * bsrc[:, None]
                )
                if self.cache_policy == "eigen":
                    # complex arithmetic via split real/imag parts
                    P_l = lax.dynamic_slice_in_dim(mats[0], offc, W, axis=-1)
                    Q_l = lax.dynamic_slice_in_dim(mats[1], offc, W, axis=-1)
                    lam_l = lax.dynamic_slice_in_dim(mats[2], offc, W, axis=-1)
                    t_re = jnp.einsum("kijw,kbjw->kbiw", Q_l[:, 0], rhs)
                    t_im = jnp.einsum("kijw,kbjw->kbiw", Q_l[:, 1], rhs)
                    vgb = c["vg"][None, :, None, None]
                    d_re = 1.0 + vgb * lam_l[:, None, 0]
                    d_im = vgb * lam_l[:, None, 1]
                    inv_mag = 1.0 / (d_re * d_re + d_im * d_im)
                    s_re = (t_re * d_re + t_im * d_im) * inv_mag
                    s_im = (t_im * d_re - t_re * d_im) * inv_mag
                    sol = (
                        jnp.einsum("kijw,kbjw->kbiw", P_l[:, 0], s_re)
                        - jnp.einsum("kijw,kbjw->kbiw", P_l[:, 1], s_im)
                    )
                    mine = (iota >= shift) & (iota < shift + count)
                    sol = jnp.where(mine[None, None, None, :], sol, u_e)
                    return _write(u_g, sol, offc), None
                if self.cache_policy == "full":
                    a_inv_l = lax.dynamic_slice_in_dim(mats, offc, W, axis=-1)
                else:
                    a_inv_l = self._level_a_inv(
                        c,
                        lax.dynamic_slice_in_dim(g_mass, offc, W, axis=-1),
                        lax.dynamic_slice_in_dim(mats, offc, W, axis=-1),
                    )
                if self.use_pallas:
                    from pbte_tpu.ops.level_solve import level_solve

                    Kmv, BSv = rhs.shape[0], rhs.shape[1]
                    KB = Kmv * BSv
                    blk = 8
                    while KB % blk:
                        blk //= 2
                    sol = level_solve(
                        a_inv_l.reshape(KB, D, D, W),
                        rhs.reshape(KB, D, W),
                        block=max(blk, 1),
                    ).reshape(Kmv, BSv, D, W)
                else:
                    sol = jnp.einsum("kbijw,kbjw->kbiw", a_inv_l, rhs)
                mine = (iota >= shift) & (iota < shift + count)
                sol = jnp.where(mine[None, None, None, :], sol, u_e)
                return _write(u_g, sol, offc), None

            u_g, _ = lax.scan(level_body, u_g, (offsets_g, counts_g),
                              unroll=self.scan_unroll)
            return u_g

        # per-group view of Tc in group-level order (padding reads element 0;
        # any garbage it produces lands on padded slots, which nothing reads)
        TcT_groups = jnp.moveaxis(TcT[:, c["perm"]], 1, 0)  # (G, D, ne)

        u = jax.vmap(sweep_group)(
            u, TcT_groups, c["mass_t"], c["face_int"], c["coupling"],
            c["nbr_pos"], c["bc_T"], c["fdot"], c["mats"], c["mass"],
            c["offsets"], c["counts"],
        )

        # macroscopic closure: per-group partials in group order -> global
        partial = jnp.einsum("gkb,gkbip->gip", c["macro_w"], u)  # (G, D, ne_pad)
        pos = c["pos_of_elem"]  # (G, ne)
        Tc_new = jax.vmap(lambda pg, po: pg[:, po])(partial, pos).sum(0).T  # (ne, D)
        Tv_new = macroscopic.compute_tv(Tc_new, c["basis_int_glob"])
        res = macroscopic.residual(Tv_new, Tv_prev)
        return u, Tc_new, Tv_new, res

    # -- outer loop ---------------------------------------------------------

    def step(self, u, Tc, Tv_prev):
        """One jitted outer iteration: returns (u, Tc, Tv, residual)."""
        return self._step(self.consts, u, Tc, Tv_prev)

    def solve(
        self,
        tol: float = 1e-7,
        max_iter: int = 101,
        state=None,
        verbose: bool = True,
        callback=None,
        check_every: int = 1,
    ):
        """Outer source iteration (ref: src/PBTESolver.cpp:208-332).

        check_every > 1 amortizes host synchronization: the residual is still
        computed on device every iteration, but only fetched (and tested
        against tol) every `check_every` iterations."""
        u, Tc, Tv = state if state is not None else self.initial_state()
        prev_Tv = Tv
        res = float("inf")
        it = 0
        for it in range(1, max_iter + 1):
            u, Tc_new, Tv_new, res_dev = self._step(self.consts, u, Tc, prev_Tv)
            if it % check_every == 0 or it == max_iter:
                res = float(res_dev)
                if verbose:
                    print(f"[pbte_tpu] iter {it}, residual = {res:.6e}")
                if callback is not None:
                    callback(it, res)
                if res < tol:
                    Tc, prev_Tv = Tc_new, Tv_new
                    break
            prev_Tv = Tv_new
            Tc = Tc_new
        return SolveResult(
            u=u, Tc=Tc, Tv=prev_Tv, residual=res, iterations=it, solver=self
        )

    # -- views / diagnostics ------------------------------------------------

    def u_by_direction(self, u):
        """Map slot-major group-ordered u (G, Km, BS, D, ne) to
        direction-major (K, BS, ne, D) for dumps/comparison."""
        u = np.asarray(u)
        out = np.zeros((self.K, self.BS, self.ne, self.D), dtype=u.dtype)
        for g in range(self.G):
            elems = self._perm[g]
            for k in range(self.Km):
                d = self.dirs_pad[g, k]
                if d >= 0:
                    out[d, :, elems, :] = u[g, k].transpose(2, 0, 1)
        return out

    def heat_flux(self, u):
        """Qc (dim, ne, D) and Qv (dim, ne) from slot-major coefficients."""
        import jax.numpy as jnp

        import jax

        partial = jnp.einsum("gkbd,gkbip->gdip", self.consts["flux_w"], u)
        pos = self.consts["pos_of_elem"]  # (G, ne)
        gathered = jax.vmap(lambda pg, po: pg[:, :, po])(partial, pos)  # (G,dim,D,ne)
        Qc = jnp.moveaxis(gathered.sum(0), -1, 1)  # (dim, ne, D)
        Qv = jnp.einsum("dei,ei->de", Qc, self.consts["basis_int_glob"])
        return Qc, Qv


@dataclasses.dataclass
class SolveResult:
    u: object  # (G, Km, BS, D, ne_pad) slot-major, group-level order
    Tc: object  # (ne, D)
    Tv: object  # (ne,)
    residual: float
    iterations: int
    solver: SourceIterationSolver

    def u_dirs(self):
        return self.solver.u_by_direction(self.u)

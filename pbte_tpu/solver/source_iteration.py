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

Ordinate storage is SLOT-MAJOR: u has shape (G, Km, BS, ne, D) where slot
(g, k) holds direction plan.dirs_of_group[g][k] (padded slots compute
dummy values that carry zero weight in every reduction). This removes all
direction gather/scatter from the hot loop and makes the Km axis the natural
device-sharding axis ("ordinate data parallelism", SURVEY.md section 2.3):
shard u/fdot/a_inv on Km, replicate element tensors, and the macroscopic
einsum reduction becomes the single cross-device psum.

Per-ordinate transport operator (ref: src/PBTESolver.cpp:146-168), scaled by
1/dt_inv (exact non-dimensionalization; keeps coefficients O(1) so the f32
TPU fast path is stable):
    A~ = M + (vg/dt_inv) * G[k,e],
    G  = -sum_d s_d S_d + sum_f max(s.n_f, 0) * Mf,
    dt_inv = max invKn over all bands (ref: src/PBTESolver.cpp:39-47).
The band dependence is the single scalar vg, so G is precomputed per
(direction, element) and A^-1 is a batched inverse (CachePolicy::FullLU
analog; "per-iteration" recomputes it each sweep — the OnTheFly analog).

Semantics preserved exactly (SURVEY.md section 2.4):
- Gauss-Seidel in space within a sweep (upwind neighbors live in strictly
  earlier levels, so they read updated values),
- lagged Tc between outer iterations,
- inflow factor 0.5*vg*(s.n - |s.n|) == vg*min(s.n, 0),
- macroscopic residual on cell-average Tv.

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
    ):
        import jax
        import jax.numpy as jnp

        if dtype is None:
            dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        self.dtype = dtype
        np_dtype = np.dtype(dtype.dtype if hasattr(dtype, "dtype") else dtype)
        if cache_policy not in ("full", "per-iteration"):
            raise ValueError(f"unknown cache_policy: {cache_policy}")
        self.cache_policy = cache_policy

        self.ne = ops.num_elements
        self.D = ops.ndof
        self.nf = ops.faces_per_elem
        self.dim = ops.dim
        self.K = quad.num_directions
        self.BS = tables.num_branches * tables.num_spectral
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
        bc_T = np.zeros((self.ne, self.nf))
        for attr, T in bc_temps.items():
            bc_T[ops.face_attr == int(attr)] = float(T)

        # ---- sweep plan, slot-major (G, Km) layout -------------------------
        plan = planner.build_plan(ops.neighbor, ops.normals, quad.directions)
        self.plan = plan
        G = plan.num_groups
        Km = max(len(d) for d in plan.dirs_of_group)
        if dir_sharding is not None:
            # pad Km so the slot axis divides evenly across devices
            ndev = int(np.prod([dir_sharding.mesh.shape[a]
                                for a in dir_sharding.spec if a is not None])) or 1
            Km = -(-Km // ndev) * ndev
        dirs_pad = np.full((G, Km), -1, dtype=np.int64)
        for g, d in enumerate(plan.dirs_of_group):
            dirs_pad[g, : len(d)] = d
        self.dirs_pad = dirs_pad  # host copy; slot (g,k) -> global dir or -1
        self.G, self.Km = G, Km
        dir_valid = dirs_pad >= 0
        dirs_np = quad.directions[:, : self.dim]
        dirs_safe = np.where(dir_valid, dirs_pad, 0)

        fdot = np.einsum(
            "efd,gkd->gkef", ops.normals, dirs_np[dirs_safe]
        )  # (G, Km, ne, nf)

        # ---- transport operator inverses (host, float64, batched) ----------
        G_mat = -np.einsum("gkd,edij->gkeij", dirs_np[dirs_safe], ops.stiff) + np.einsum(
            "gkef,efij->gkeij", np.maximum(fdot, 0.0), ops.face_mass
        )
        vg_s = vg / self.dt_inv  # non-dimensionalized group velocity
        put = lambda a: jax.device_put(np.ascontiguousarray(a, dtype=np_dtype))
        sput = (
            (lambda a: jax.device_put(np.ascontiguousarray(a, dtype=np_dtype)))
            if dir_sharding is None
            else (lambda a: jax.device_put(
                np.ascontiguousarray(a, dtype=np_dtype), self._slot_sharding(a)))
        )
        self._dir_sharding = dir_sharding
        if cache_policy == "full":
            A = (
                ops.mass[None, None, None]
                + vg_s[None, None, :, None, None, None] * G_mat[:, :, None]
            )  # (G, Km, BS, ne, D, D)
            self._a_inv = sput(np.linalg.inv(A))
            self._g_mat = None
        else:
            self._a_inv = None
            self._g_mat = sput(G_mat)

        # ---- device constants ---------------------------------------------
        iput = lambda a: jax.device_put(np.ascontiguousarray(a, dtype=np.int32))
        self.mass_t = put(np.swapaxes(ops.mass, -1, -2))
        self.mass = put(ops.mass)
        self.basis_int = put(ops.basis_int)
        self.face_int = put(ops.face_int)
        self.coupling = put(ops.coupling)
        self.neighbor = iput(ops.neighbor)
        self.bc_T = put(bc_T)
        self.vg = put(vg_s)  # scaled by 1/dt_inv
        self.src_w = put(inv_kn * heat_cap / (self.omega * self.dt_inv))
        self.relax_w = put(1.0 - inv_kn / self.dt_inv)
        self.bc_w = put(heat_cap / self.omega)
        self._levels = iput(plan.levels)  # (G, L, W), -1 padded
        self._fdot = sput(fdot)

        # slot-shaped macroscopic weights; padded slots weigh zero
        mw = macroscopic.macro_weights(quad, tables)  # (K, BS)
        mw_slots = np.where(dir_valid[..., None], mw[dirs_safe], 0.0)
        self.macro_w = sput(mw_slots)  # (G, Km, BS)
        fw = macroscopic.flux_weights(quad, tables, self.dim)  # (dim, K, BS)
        fw_slots = np.where(
            dir_valid[None, ..., None], fw[:, dirs_safe.reshape(-1)].reshape(
                self.dim, G, Km, self.BS), 0.0
        )
        self.flux_w = sput(np.moveaxis(fw_slots, 0, -1))  # (G, Km, BS, dim)

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

        shape = (self.G, self.Km, self.BS, self.ne, self.D)
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

    def _sweep_level(self, u_g, level, Tc, fdot, a_inv):
        """One wavefront level for one group.

        u_g (Km, BS, ne, D); level (W,); fdot (Km, ne, nf);
        a_inv (Km, BS, ne, D, D)."""
        import jax.numpy as jnp

        ne, nf = self.ne, self.nf
        valid = level >= 0
        es = jnp.where(valid, level, 0)

        Mt = self.mass_t[es]  # (W, D, D)
        t_tc = jnp.einsum("wij,wj->wi", Mt, Tc[es])  # (W, D)
        u_e = u_g[:, :, es]  # (Km, BS, W, D)
        t_old = jnp.einsum("wij,kbwj->kbwi", Mt, u_e)
        rhs = (
            self.src_w[None, :, None, None] * t_tc[None, None]
            + self.relax_w[None, :, None, None] * t_old
        )  # (Km, BS, W, D)

        for f in range(nf):
            nbr = self.neighbor[es, f]  # (W,)
            is_b = nbr < 0
            nbr_s = jnp.where(is_b, 0, nbr)
            fd = fdot[:, es, f]  # (Km, W)
            cin = jnp.minimum(fd, 0.0)  # inflow factor / vg
            u_nbr = u_g[:, :, nbr_s]  # (Km, BS, W, D)
            cu = jnp.einsum("wij,kbwj->kbwi", self.coupling[es, f], u_nbr)
            bterm = (
                self.bc_w[None, :, None, None]
                * self.bc_T[es, f][None, None, :, None]
                * self.face_int[es, f][None, None, :, :]
            )
            term = jnp.where(is_b[None, None, :, None], bterm, cu)
            rhs = rhs - self.vg[None, :, None, None] * cin[:, None, :, None] * term

        sol = jnp.einsum("kbwij,kbwj->kbwi", a_inv[:, :, es], rhs)
        scatter_idx = jnp.where(valid, es, ne)  # pad -> out-of-bounds
        return u_g.at[:, :, scatter_idx].set(sol, mode="drop")

    def _group_a_inv(self, g_mat):
        """Per-iteration A^-1 for one group (memory-lean policy)."""
        import jax.numpy as jnp

        A = (
            self.mass[None, None]
            + self.vg[None, :, None, None, None] * g_mat[:, None]
        )
        return jnp.linalg.inv(A)

    def _step_impl(self, u, Tc, Tv_prev):
        import jax
        from jax import lax

        def sweep_group(u_g, levels, fdot, mats):
            a_inv = mats if self.cache_policy == "full" else self._group_a_inv(mats)

            def level_body(u_g, level):
                return self._sweep_level(u_g, level, Tc, fdot, a_inv), None

            u_g, _ = lax.scan(level_body, u_g, levels)
            return u_g

        mats = self._a_inv if self.cache_policy == "full" else self._g_mat
        u = jax.vmap(sweep_group)(u, self._levels, self._fdot, mats)
        Tc_new = jax.numpy.einsum("gkb,gkbei->ei", self.macro_w, u)
        Tv_new = macroscopic.compute_tv(Tc_new, self.basis_int)
        res = macroscopic.residual(Tv_new, Tv_prev)
        return u, Tc_new, Tv_new, res

    # -- outer loop ---------------------------------------------------------

    def step(self, u, Tc, Tv_prev):
        """One jitted outer iteration: returns (u, Tc, Tv, residual)."""
        return self._step(u, Tc, Tv_prev)

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
            u, Tc_new, Tv_new, res_dev = self._step(u, Tc, prev_Tv)
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
        """Map slot-major u (G, Km, BS, ne, D) to direction-major
        (K, BS, ne, D) for dumps and cross-implementation comparison."""
        u = np.asarray(u)
        out = np.zeros((self.K, self.BS, self.ne, self.D), dtype=u.dtype)
        for g in range(self.G):
            for k in range(self.Km):
                d = self.dirs_pad[g, k]
                if d >= 0:
                    out[d] = u[g, k]
        return out

    def heat_flux(self, u):
        """Qc (dim, ne, D) and Qv (dim, ne) from slot-major coefficients."""
        import jax.numpy as jnp

        Qc = jnp.einsum("gkbd,gkbei->dei", self.flux_w, u)
        Qv = jnp.einsum("dei,ei->de", Qc, self.basis_int)
        return Qc, Qv


@dataclasses.dataclass
class SolveResult:
    u: object  # (G, Km, BS, ne, D) slot-major
    Tc: object  # (ne, D)
    Tv: object  # (ne,)
    residual: float
    iterations: int
    solver: SourceIterationSolver

    def u_dirs(self):
        return self.solver.u_by_direction(self.u)

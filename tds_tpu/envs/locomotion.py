"""Generic locomotion environment over a URDF robot + ground plane.

Mirrors LocomotionContactSimulation (examples/environments/
locomotion_contact_simulation.h:16-300): per control step
  PD(initial_poses + clipped action) -> ABA -> velocity half-step ->
  contact impulses -> position update
with observation [q, qd]. Fixed-base variants emulate the floating base
with 3 prismatic + 3 revolute passive joints (the *_xyz_xyzrot URDFs) whose
links are skipped by the PD loop (:180).
"""

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from tds_tpu.contact.mlcp import ContactSolverParams
from tds_tpu.control.pd import pd_tau
from tds_tpu.dynamics.forward_dynamics import aba_factor, forward_dynamics_from_kin
from tds_tpu.dynamics.integrator import integrate_euler_qdd, integrate_q
from tds_tpu.dynamics.kinematics import fk_links
from tds_tpu.envs.base import Env, EnvState
from tds_tpu.model.multibody import MultiBodyModel
from tds_tpu.world import build_world, make_ground_plane, resolve_contacts


class LocomotionEnv(Env):
    def __init__(
        self,
        model: MultiBodyModel,
        geoms,
        initial_poses: Sequence[float],
        kp: float,
        kd: float,
        max_force: float,
        dt: float = 1e-3,
        start_base_position=(0.0, 0.0, 0.48),
        action_limit: float = 0.4,
        reset_noise: float = 0.05,
        settle_steps: int = 10,
        gravity=(0.0, 0.0, -9.81),
        solver: ContactSolverParams = ContactSolverParams(),
        contact_model: str = "mlcp",
        skip_links: Optional[int] = None,
        terrain=None,
        height_scan: Optional[Sequence[Tuple[float, float]]] = None,
        reset_pool=None,
        reset_pool_prob: float = 0.5,
    ):
        self.model = model
        self.dt = dt
        self.kp = kp
        self.kd = kd
        self.max_force = max_force
        self.action_limit = action_limit
        self.reset_noise = reset_noise
        self.settle_steps = settle_steps
        self.start_base_position = jnp.asarray(start_base_position)
        self.gravity = jnp.asarray(gravity)
        self.initial_poses = jnp.asarray(initial_poses)
        self.action_dim = len(initial_poses)
        self.observation_dim = model.dof_q + model.dof_qd
        if skip_links is None:
            skip_links = 0 if model.is_floating else 6
        self.skip_links = skip_links
        # ground body in the robot's dtype: the mesh narrowphase derives its
        # working dtype from the GROUND body's transform (unlike the plane,
        # whose transform is never read), so an f64 ground under x64 would
        # promote qd through the contact impulses
        plane_model, plane_geoms = make_ground_plane(
            dtype=model.x_t_pos.dtype
        )
        if terrain is not None:
            # beyond reference: walk on a triangle-mesh terrain instead of
            # the infinite plane (a Mesh with max_contacts > 0, collided
            # per-toe by the triangle-accurate sphere_mesh narrowphase)
            from tds_tpu.model.geometry import GeomAttachment

            plane_geoms = (GeomAttachment(link_index=-1, shape=terrain),)
        self.world = build_world(
            [(plane_model, plane_geoms), (model, tuple(geoms))],
            solver=solver,
            contact_model=contact_model,
        )
        # optional exteroception: (x, y) body-frame offsets at which a
        # vertical ray samples the terrain height; heights relative to the
        # base join the observation (beyond reference — enables
        # terrain-aware policies; needs terrain=Mesh(...))
        self.height_scan = None
        if height_scan is not None:
            if terrain is None:
                raise ValueError("height_scan requires terrain=Mesh(...)")
            self.height_scan = jnp.asarray(height_scan)
            self.terrain = terrain
            self.observation_dim += len(height_scan)
        # Brink-state reset pool (beyond reference, training-only): with
        # probability reset_pool_prob, reset() returns a state drawn from
        # this (P, dof_q)/(P, dof_qd) pool instead of the standing start —
        # typically states harvested near a trained gait's own failure
        # point (tools/make_reset_pool.py), so a trainer spends its
        # rollouts exactly where the policy dies rather than re-walking
        # there. The base x coordinate is re-zeroed on pool resets (pure
        # translation, physics-invariant) to keep position-based rewards
        # comparable. Eval envs must NOT set this.
        self.reset_pool = None
        self.reset_pool_prob = float(reset_pool_prob)
        if reset_pool is not None:
            pq, pqd = reset_pool
            dt_ = model.x_t_pos.dtype
            self.reset_pool = (
                jnp.asarray(pq, dt_), jnp.asarray(pqd, dt_)
            )
            assert self.reset_pool[0].shape[-1] == model.dof_q
            assert self.reset_pool[1].shape[-1] == model.dof_qd

    # -- dynamics ----------------------------------------------------------
    def sim_step(self, q, qd, action):
        clipped = jnp.clip(action, -self.action_limit, self.action_limit)
        targets = self.initial_poses + clipped
        tau = pd_tau(
            self.model, q, qd, targets, self.kp, self.kd, self.max_force,
            skip_links=self.skip_links,
        )
        # one FK pass and one articulated factor shared by ABA and the
        # contact solver's O(n) M^-1 J^T propagation
        kin = fk_links(self.model, q, qd)
        factor = aba_factor(self.model, kin)
        qdd = forward_dynamics_from_kin(
            self.model, kin, q, qd, tau, self.gravity, factor=factor
        )
        qd = integrate_euler_qdd(self.model, q, qd, qdd, self.dt)
        zero = jnp.zeros(q.shape[:-1] + (0,), dtype=q.dtype)
        qds = resolve_contacts(
            self.world, (zero, q), (zero, qd), self.dt,
            kins=[None, kin], factors=[None, factor],
        )
        qd = qds[1]
        q, qd = integrate_q(self.model, q, qd, self.dt)
        return q, qd

    def observation(self, q, qd):
        obs = jnp.concatenate([q, qd], axis=-1)
        if self.height_scan is not None:
            obs = jnp.concatenate([obs, self._scan_heights(q)], axis=-1)
        return obs

    def _base_yaw(self, q):
        if self.model.is_floating:
            x, y, z, w = (q[..., i] for i in range(4))
            return jnp.arctan2(
                2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z)
            )
        return q[..., 5]  # rpy z of the xyz_xyzrot emulation chain

    def _scan_heights(self, q):
        """Terrain height under each scan point, relative to the base
        height. Scan offsets are EGOCENTRIC (yaw-rotated body-frame x,y);
        vertical Moller-Trumbore rays onto the terrain mesh; misses read
        as BIG -> clipped to a deep-drop sentinel of -10."""
        from tds_tpu.algebra.transform import Transform
        from tds_tpu.collision.raycast import ray_mesh

        pos, _ = self.base_pose_xyz_rpy(q)
        offsets = self.height_scan.astype(q.dtype)  # (S, 2) body frame
        yaw = self._base_yaw(q)
        c, s = jnp.cos(yaw)[..., None], jnp.sin(yaw)[..., None]
        ox, oy = offsets[..., 0], offsets[..., 1]
        world_off = jnp.stack(
            [c * ox - s * oy, s * ox + c * oy], axis=-1
        )  # (…, S, 2)
        xy = pos[..., None, :2] + world_off  # (…, S, 2)
        from tds_tpu.model.geometry import Heightfield

        if isinstance(self.terrain, Heightfield):
            # O(1) exact query of the same triangulated surface
            from tds_tpu.collision.narrowphase import heightfield_height

            height = heightfield_height(
                self.terrain, xy[..., 0], xy[..., 1]
            )
            return jnp.clip(height - pos[..., None, 2], -10.0, 10.0)
        top, span = 100.0, 200.0
        origins = jnp.concatenate(
            [xy, jnp.full(xy.shape[:-1] + (1,), top, q.dtype)], axis=-1
        )
        targets = origins.at[..., 2].add(-span)
        eye = jnp.eye(3, dtype=q.dtype)
        x_t = Transform(pos=jnp.zeros(3, q.dtype), rot=eye)
        frac, _ = ray_mesh(origins, targets, self.terrain, x_t)
        height = top - frac * span  # terrain z (misses -> huge negative)
        rel = height - pos[..., None, 2]
        return jnp.clip(rel, -10.0, 10.0)

    # -- env API -----------------------------------------------------------
    def _joint_q_offset(self):
        """q index of the first PD-controlled joint (after the passive
        base-emulation chain)."""
        for i in range(self.skip_links, self.model.num_links):
            off = self.model.q_offsets[i]
            if off >= 0:
                return off
        return 7 if self.model.is_floating else 0

    def _set_joint_poses(self, q, poses):
        """Scatter the compact pose vector (one entry per PD-controlled
        1-DoF joint) into the matching q slots. Spherical joints keep their
        identity quaternions — a contiguous q-slice write (the old code)
        overwrote quaternion components on mixed spherical/1-DoF chains
        like the humanoid."""
        from tds_tpu.model.joints import JointType

        k = 0
        for i in range(self.skip_links, self.model.num_links):
            jt = JointType(self.model.joint_types[i])
            if jt in (JointType.FIXED, JointType.SPHERICAL):
                continue
            q = q.at[self.model.q_offsets[i]].set(poses[..., k])
            k += 1
        assert k == self.action_dim, (k, self.action_dim)
        return q

    def initial_state(self, key):
        model = self.model
        q = model.zero_q()
        if model.is_floating:
            q = q.at[4:7].set(self.start_base_position.astype(q.dtype))
            q = self._set_joint_poses(q, self.initial_poses.astype(q.dtype))
        else:
            n_base = min(3, self._joint_q_offset())
            q = q.at[0:n_base].set(
                self.start_base_position[:n_base].astype(q.dtype)
            )
            noise = jax.random.uniform(
                key, (self.action_dim,), minval=-self.reset_noise,
                maxval=self.reset_noise, dtype=q.dtype,
            )
            q = self._set_joint_poses(
                q, self.initial_poses.astype(q.dtype) + noise
            )
        qd = model.zero_qd()
        return q, qd

    def reset(self, key):
        key, sub = jax.random.split(key)
        q, qd = self.initial_state(sub)
        # settle-down steps with zero action (laikago_environment2.h:96-110)
        zero_action = jnp.zeros(self.action_dim, dtype=q.dtype)

        def body(carry, _):
            q, qd = carry
            return self.sim_step(q, qd, zero_action), None

        (q, qd), _ = jax.lax.scan(body, (q, qd), None, length=self.settle_steps)
        if self.reset_pool is not None:
            pq, pqd = self.reset_pool
            key, k_use, k_idx = jax.random.split(key, 3)
            use = jax.random.bernoulli(k_use, self.reset_pool_prob)
            idx = jax.random.randint(k_idx, (), 0, pq.shape[0])
            qp, qdp = pq[idx], pqd[idx]
            x_i = 4 if self.model.is_floating else 0
            qp = qp.at[..., x_i].set(0.0)  # translate back to the origin
            q = jnp.where(use, qp, q)
            qd = jnp.where(use, qdp, qd)
        state = EnvState(q=q, qd=qd, t=jnp.zeros((), jnp.int32), key=key)
        return state, self.observation(q, qd)

    def step(self, state: EnvState, action):
        q, qd = self.sim_step(state.q, state.qd, action)
        reward, done = self.reward_done(state.q, state.qd, q, qd)
        new_state = EnvState(q=q, qd=qd, t=state.t + 1, key=state.key)
        return new_state, self.observation(q, qd), reward, done

    # -- per-robot specialization -----------------------------------------
    def base_pose_xyz_rpy(self, q):
        """(x, y, z, up_dot_world_z) for reward/termination."""
        from tds_tpu.algebra import quaternion, rotation

        if self.model.is_floating:
            pos = q[..., 4:7]
            up = quaternion.to_matrix(q[..., 0:4])[..., 2, 2]
        else:
            pos = q[..., 0:3]
            jt = tuple(int(t) for t in self.model.joint_types[:4])
            if len(jt) == 4 and jt[3] == 8 and jt[:3] == (0, 1, 2):
                # xyz_spherical emulated base (humanoid): q[3:7] is the
                # base xyzw quaternion, NOT rpy
                up = quaternion.to_matrix(q[..., 3:7])[..., 2, 2]
            else:
                rpy = q[..., 3:6]
                up = rotation.from_rpy(
                    rpy[..., 0], rpy[..., 1], rpy[..., 2]
                )[..., 2, 2]
        return pos, up

    def reward_done(self, q_prev, qd_prev, q, qd):
        raise NotImplementedError

"""Static multibody model description + dynamic state pytree.

Design (TPU-first): the articulated-system *topology* — joint types, parent
indices, q/qd index layout, floating-base flag — is plain static Python held
in non-pytree fields, so every dynamics function specializes per model at
trace time and compiles to one fused XLA program (the reference achieves the
same specialization through C++ templates + CppADCodeGen, see
src/multi_body.hpp:12-677). The numeric model parameters (joint frames,
inertias, damping) are jnp array leaves, so ``jax.grad`` can differentiate
rollouts with respect to them (the reference's "model built FROM params"
sys-id pattern, examples/pendulum_sys_id.cpp:33).

State layout parity with the reference (multi_body.hpp:599-663, :324-378):
- fixed base:    q = [joint coords...],      qd = [joint vels...]
- floating base: q = [qx,qy,qz,qw, x,y,z, joints...]
                 qd = [wx,wy,wz, vx,vy,vz, joints...]  (world-frame base twist)
- spherical joints contribute 4 q (xyzw) / 3 qd (body-frame angular velocity)
- tau covers actuated DoF only: tau index = qd_index - 6 for floating base
"""

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import struct

from tds_tpu.algebra import quaternion, rotation
from tds_tpu.algebra.inertia import RigidBodyInertia
from tds_tpu.algebra.transform import Transform
from tds_tpu.model.joints import JointType, motion_subspace, q_width, qd_width


@struct.dataclass
class MultiBodyModel:
    # --- array leaves (differentiable model parameters) ---
    x_t_pos: jnp.ndarray  # (nl, 3) joint frame origin in parent link frame
    x_t_rot: jnp.ndarray  # (nl, 3, 3) joint frame rotation in parent
    joint_axis: jnp.ndarray  # (nl, 3) axis for *_AXIS joints (unit x otherwise)
    mass: jnp.ndarray  # (nl,)
    com: jnp.ndarray  # (nl, 3) first moment h = m*com
    inertia: jnp.ndarray  # (nl, 3, 3) about link origin
    stiffness: jnp.ndarray  # (nl,) linear joint stiffness
    damping: jnp.ndarray  # (nl,) linear joint damping
    base_mass: jnp.ndarray  # ()
    base_com: jnp.ndarray  # (3,) first moment
    base_inertia: jnp.ndarray  # (3, 3)
    base_pos: jnp.ndarray  # (3,) fixed-base world placement
    base_rot: jnp.ndarray  # (3, 3)
    joint_damping: jnp.ndarray  # () spherical-joint velocity damping factor

    # --- static topology (trace-time constants) ---
    joint_types: Tuple[int, ...] = struct.field(pytree_node=False)
    parents: Tuple[int, ...] = struct.field(pytree_node=False)
    q_offsets: Tuple[int, ...] = struct.field(pytree_node=False)
    qd_offsets: Tuple[int, ...] = struct.field(pytree_node=False)
    is_floating: bool = struct.field(pytree_node=False)
    dof_q: int = struct.field(pytree_node=False)  # len(q) incl. base 7
    dof_qd: int = struct.field(pytree_node=False)  # len(qd) incl. base 6
    dof_actuated: int = struct.field(pytree_node=False)
    link_names: Tuple[str, ...] = struct.field(pytree_node=False, default=())
    joint_names: Tuple[str, ...] = struct.field(pytree_node=False, default=())
    name: str = struct.field(pytree_node=False, default="multibody")

    # ------------------------------------------------------------------
    @property
    def num_links(self) -> int:
        return len(self.joint_types)

    @property
    def dof(self) -> int:
        return self.dof_q

    def x_t(self, i: int) -> Transform:
        return Transform(pos=self.x_t_pos[i], rot=self.x_t_rot[i])

    def rbi(self, i: int) -> RigidBodyInertia:
        return RigidBodyInertia(
            mass=self.mass[i], h=self.com[i], inertia=self.inertia[i]
        )

    def base_rbi(self) -> RigidBodyInertia:
        return RigidBodyInertia(
            mass=self.base_mass, h=self.base_com, inertia=self.base_inertia
        )

    def base_x_world(self) -> Transform:
        return Transform(pos=self.base_pos, rot=self.base_rot)

    def motion_subspace(self, i: int):
        return motion_subspace(
            JointType(self.joint_types[i]), self.joint_axis[i], self.x_t_pos.dtype
        )

    # --- q/qd slicing (reference multi_body.hpp:490-573) ---------------
    def q_for_link(self, q, i: int):
        jt = JointType(self.joint_types[i])
        w = q_width(jt)
        if w == 0:
            return jnp.zeros(q.shape[:-1] + (1,), dtype=q.dtype)
        return q[..., self.q_offsets[i] : self.q_offsets[i] + w]

    def qd_for_link(self, qd, i: int):
        jt = JointType(self.joint_types[i])
        w = qd_width(jt)
        if w == 0:
            return jnp.zeros(qd.shape[:-1] + (1,), dtype=qd.dtype)
        return qd[..., self.qd_offsets[i] : self.qd_offsets[i] + w]

    def tau_for_link(self, tau, i: int):
        """tau holds actuated DoF only (reference multi_body.hpp:560-573)."""
        jt = JointType(self.joint_types[i])
        w = qd_width(jt)
        if w == 0 or tau is None:
            return jnp.zeros((1,) if w == 0 else (w,), dtype=self.x_t_pos.dtype)
        off = self.qd_offsets[i] - (6 if self.is_floating else 0)
        return tau[..., off : off + w]

    def dof_coupling_mask(self):
        """Boolean (dof_qd, dof_qd) numpy mask: M[i, j] can be nonzero only
        when the joints carrying dofs i and j lie on one root-to-leaf path
        (CRBA structure). Static topology -> computed in Python; used for
        sparsity-aware factorization."""
        import numpy as np

        n = self.dof_qd
        mask = np.eye(n, dtype=bool)
        base = 6 if self.is_floating else 0
        if base:
            mask[:base, :] = True
            mask[:, :base] = True

        def dofs_of(link):
            jt = JointType(self.joint_types[link])
            w = qd_width(jt)
            off = self.qd_offsets[link]
            return range(off, off + w) if w else range(0)

        for i in range(self.num_links):
            # couple i with itself and every ancestor
            j = i
            chain = []
            while j >= 0:
                chain.append(j)
                j = self.parents[j]
            for a in chain:
                for di in dofs_of(i):
                    for dj in dofs_of(a):
                        mask[di, dj] = True
                        mask[dj, di] = True
        return mask

    # --- default state -------------------------------------------------
    def zero_q(self, dtype=None):
        dtype = dtype or self.x_t_pos.dtype
        q = jnp.zeros(self.dof_q, dtype=dtype)
        if self.is_floating:
            q = q.at[3].set(1.0)
        for i, jt in enumerate(self.joint_types):
            if jt == JointType.SPHERICAL:
                q = q.at[self.q_offsets[i] + 3].set(1.0)
        return q

    def zero_qd(self, dtype=None):
        return jnp.zeros(self.dof_qd, dtype=dtype or self.x_t_pos.dtype)


@struct.dataclass
class MultiBodyState:
    """Generalized coordinates; the only state carried between steps."""

    q: jnp.ndarray
    qd: jnp.ndarray


class MultiBodyBuilder:
    """Imperative model construction, mirroring MultiBody::attach/initialize
    (reference multi_body.hpp:599-663, :324-378).

    Links must be appended in topological order (parent index < link index).
    """

    def __init__(self, is_floating: bool = False, name: str = "multibody"):
        self.is_floating = is_floating
        self.name = name
        self.joint_types = []
        self.parents = []
        self.x_t_pos = []
        self.x_t_rot = []
        self.joint_axes = []
        self.masses = []
        self.coms = []  # first moments (m * com)
        self.inertias = []  # about link origin
        self.stiffnesses = []
        self.dampings = []
        self.link_names = []
        self.joint_names = []
        self.base_mass = 0.0
        self.base_com = (0.0, 0.0, 0.0)
        self.base_inertia = ((0.0,) * 3,) * 3
        self.base_pos = (0.0, 0.0, 0.0)
        self.base_rot = ((1.0, 0, 0), (0, 1.0, 0), (0, 0, 1.0))
        # spherical-joint velocity decay FACTOR per integrator.hpp:107-118,
        # applied as pow(joint_damping, 1000*dt) each step. Reference default
        # 0.995 (multi_body.hpp:51); 1.0 disables damping. NOTE: 0.0 means
        # TOTAL decay — pow(0, x) = 0 freezes every spherical joint, the
        # round-3 bug this default (formerly 0.0) silently caused.
        self.joint_damping = 0.995

    def set_base_inertia(self, mass, com, inertia_about_com):
        """Set base inertial params (com given as center of mass)."""
        import numpy as np

        mass = float(mass)
        com = np.asarray(com, dtype=float)
        icom = np.asarray(inertia_about_com, dtype=float)
        cx = _np_cross_matrix(com)
        self.base_mass = mass
        self.base_com = tuple(mass * com)
        self.base_inertia = icom + mass * (cx @ cx.T)
        return self

    def add_link(
        self,
        joint_type: JointType,
        parent: int,
        *,
        x_t_pos=(0.0, 0.0, 0.0),
        x_t_rpy=None,
        x_t_rot=None,
        axis=(1.0, 0.0, 0.0),
        mass=0.0,
        com=(0.0, 0.0, 0.0),
        inertia_about_com=None,
        stiffness=0.0,
        damping=0.0,
        link_name: str = "",
        joint_name: str = "",
    ) -> int:
        import numpy as np

        if parent >= len(self.joint_types):
            raise ValueError("links must be appended in topological order")
        self.joint_types.append(JointType(joint_type))
        self.parents.append(int(parent))
        self.x_t_pos.append(np.asarray(x_t_pos, dtype=float))
        if x_t_rot is not None:
            rot = np.asarray(x_t_rot, dtype=float)
        elif x_t_rpy is not None:
            r, p, y = x_t_rpy
            rot = _np_rpy(r, p, y)
        else:
            rot = np.eye(3)
        self.x_t_rot.append(rot)
        ax = np.asarray(axis, dtype=float)
        if np.linalg.norm(ax) == 0.0:
            raise ValueError("zero joint axis")
        # NOT normalized: the reference uses URDF axes verbatim
        # (link.hpp:141-167 only rejects zero axes), and files like the ant's
        # carry 0.7071067-style approximations whose norm != 1.
        self.joint_axes.append(ax)
        mass = float(mass)
        com = np.asarray(com, dtype=float)
        icom = (
            np.zeros((3, 3))
            if inertia_about_com is None
            else np.asarray(inertia_about_com, dtype=float)
        )
        if icom.ndim == 1:  # diagonal given
            icom = np.diag(icom)
        cx = _np_cross_matrix(com)
        self.masses.append(mass)
        self.coms.append(mass * com)
        self.inertias.append(icom + mass * (cx @ cx.T))
        self.stiffnesses.append(float(stiffness))
        self.dampings.append(float(damping))
        self.link_names.append(link_name)
        self.joint_names.append(joint_name)
        return len(self.joint_types) - 1

    def finalize(self, dtype=None) -> MultiBodyModel:
        import numpy as np

        if dtype is None:
            # canonical float dtype: f64 when jax_enable_x64 is on, else f32
            import jax

            dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

        nl = len(self.joint_types)
        q_off, qd_off = [], []
        qi = 7 if self.is_floating else 0
        qdi = 6 if self.is_floating else 0
        n_act = 0
        for jt in self.joint_types:
            if jt == JointType.FIXED:
                q_off.append(-2)
                qd_off.append(-2)
            else:
                q_off.append(qi)
                qd_off.append(qdi)
                qi += q_width(jt)
                qdi += qd_width(jt)
                n_act += qd_width(jt)

        def arr(x, shape=None):
            a = jnp.asarray(np.asarray(x, dtype=float), dtype=dtype)
            if shape is not None and nl == 0:
                a = a.reshape(shape)
            return a

        return MultiBodyModel(
            x_t_pos=arr(np.stack(self.x_t_pos) if nl else np.zeros((0, 3))),
            x_t_rot=arr(np.stack(self.x_t_rot) if nl else np.zeros((0, 3, 3))),
            joint_axis=arr(np.stack(self.joint_axes) if nl else np.zeros((0, 3))),
            mass=arr(self.masses),
            com=arr(np.stack(self.coms) if nl else np.zeros((0, 3))),
            inertia=arr(np.stack(self.inertias) if nl else np.zeros((0, 3, 3))),
            stiffness=arr(self.stiffnesses),
            damping=arr(self.dampings),
            base_mass=arr(self.base_mass),
            base_com=arr(self.base_com),
            base_inertia=arr(self.base_inertia),
            base_pos=arr(self.base_pos),
            base_rot=arr(self.base_rot),
            joint_damping=arr(self.joint_damping),
            joint_types=tuple(int(t) for t in self.joint_types),
            parents=tuple(self.parents),
            q_offsets=tuple(q_off),
            qd_offsets=tuple(qd_off),
            is_floating=self.is_floating,
            dof_q=qi,
            dof_qd=qdi,
            dof_actuated=n_act,
            link_names=tuple(self.link_names),
            joint_names=tuple(self.joint_names),
            name=self.name,
        )


def _np_cross_matrix(v):
    import numpy as np

    return np.array(
        [[0.0, -v[2], v[1]], [v[2], 0.0, -v[0]], [-v[1], v[0], 0.0]]
    )


def _np_rpy(r, p, y):
    import numpy as np

    cr, sr = np.cos(r), np.sin(r)
    cp, sp = np.cos(p), np.sin(p)
    cy, sy = np.cos(y), np.sin(y)
    rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
    ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
    return rz @ ry @ rx

from tds_tpu.algebra import quaternion, rotation, spatial
from tds_tpu.algebra.transform import Transform
from tds_tpu.algebra.inertia import RigidBodyInertia, ArticulatedBodyInertia

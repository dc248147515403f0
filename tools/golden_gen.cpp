// Golden-trajectory generator: runs the REFERENCE implementation
// (tiny-differentiable-simulator, mounted read-only at /root/reference)
// and dumps double-precision trajectories as JSON for parity tests.
// Build:  g++ -std=c++17 -O2 -I/root/reference/src -DTDS_HOME=... tools/golden_gen.cpp -o /tmp/golden_gen
// Output: tests/golden/<case>.json
#include <cstdio>
#include <fstream>
#include <string>
#include <vector>

#include "math/tiny/tiny_algebra.hpp"
#include "math/tiny/tiny_double_utils.h"
#include "multi_body.hpp"
#include "world.hpp"
#include "dynamics/forward_dynamics.hpp"
#include "dynamics/integrator.hpp"
#include "dynamics/mass_matrix.hpp"
#include "urdf/urdf_parser.hpp"
#include "urdf/urdf_to_multi_body.hpp"

using Algebra = TinyAlgebra<double, TINY::DoubleUtils>;
using Vector3 = Algebra::Vector3;
using VectorX = Algebra::VectorX;

static void dump_vec(FILE* out, const VectorX& v);
static std::string read_file(const std::string& path);

// ---- PD-driven robot on plane THROUGH the reference World/MLCP ------------
// The articulated-contact analog of the reference's RBDL simulation-loop
// test (test_rbdl.cpp:107-300): fixed-base *_xyz_xyzrot robot (6 passive
// base-emulation joints), per-step PD toward initial poses
// (locomotion_contact_simulation.h:170-257), env-loop ordering (:259-271).
static void pd_locomotion_golden(const char* urdf_path, const char* out_path,
                                 const std::vector<double>& poses, double kp,
                                 double kd, double max_force, double start_z,
                                 double dt, int steps, int snap_every) {
  tds::World<Algebra> world;
  tds::NullLogger logger;
  int flags = 0;

  tds::UrdfStructures<Algebra> plane_urdf;
  std::string plane_text = read_file("/root/reference/data/plane_implicit.urdf");
  tds::UrdfParser<Algebra>::load_urdf_from_string(plane_text, flags, logger,
                                                  plane_urdf);
  tds::MultiBody<Algebra>* plane_mb = world.create_multi_body("plane");
  tds::UrdfToMultiBody<Algebra>::convert_to_multi_body(plane_urdf, world,
                                                       *plane_mb, 0);
  plane_mb->initialize();

  tds::UrdfStructures<Algebra> urdf;
  std::string text = read_file(urdf_path);
  if (!tds::UrdfParser<Algebra>::load_urdf_from_string(text, flags, logger,
                                                       urdf)) {
    printf("skipping %s (parse failed)\n", out_path);
    return;
  }
  tds::MultiBody<Algebra>* mb = world.create_multi_body("robot");
  tds::UrdfToMultiBody<Algebra>::convert_to_multi_body(urdf, world, *mb, 0);
  mb->initialize();

  // deterministic initial state: base emulation z, PD joints at pose
  for (int i = 0; i < mb->dof(); ++i) mb->q(i) = 0.0;
  for (int i = 0; i < mb->dof_qd(); ++i) mb->qd(i) = 0.0;
  mb->q(2) = start_z;
  {
    size_t pose_index = 0;
    int li = 0;
    for (const auto& link : *mb) {
      if (link.joint_type != tds::JOINT_FIXED && li >= 6 &&
          pose_index < poses.size()) {
        mb->q(link.q_index) = poses[pose_index++];
      }
      ++li;
    }
  }

  Vector3 gravity(0., 0., -9.81);
  world.set_gravity(gravity);

  FILE* out = fopen(out_path, "w");
  fprintf(out, "{\"dt\": %.17g, \"kp\": %g, \"kd\": %g, \"max_force\": %g,"
               " \"snapshots\": {", dt, kp, kd, max_force);
  bool first = true;
  for (int t = 0; t <= steps; ++t) {
    if (t % snap_every == 0) {
      fprintf(out, "%s\"%d\": {\"q\": ", first ? "" : ",", t);
      dump_vec(out, mb->q());
      fprintf(out, ", \"qd\": ");
      dump_vec(out, mb->qd());
      fprintf(out, "}");
      first = false;
    }
    if (t == steps) break;
    // PD torques toward the initial poses (zero action), passive first 6
    size_t pose_index = 0;
    int li = 0;
    for (int i = 0; i < mb->dof_actuated(); ++i) mb->tau(i) = 0.0;
    for (const auto& link : *mb) {
      if (link.joint_type != tds::JOINT_FIXED && li >= 6 &&
          pose_index < poses.size()) {
        double err = poses[pose_index] - mb->q(link.q_index);
        double force = kp * err - kd * mb->qd(link.qd_index);
        if (force > max_force) force = max_force;
        if (force < -max_force) force = -max_force;
        mb->tau(link.qd_index) = force;
        ++pose_index;
      }
      ++li;
    }
    tds::forward_dynamics(*mb, gravity);
    mb->clear_forces();
    tds::integrate_euler_qdd(*mb, dt);
    world.step(dt);
    tds::integrate_euler(*mb, dt);
  }
  fprintf(out, "}}\n");
  fclose(out);
  printf("wrote %s\n", out_path);
}

static std::string read_file(const std::string& path) {
  std::ifstream f(path);
  return std::string(std::istreambuf_iterator<char>(f), {});
}

// ---- random-configuration ABA+CRBA sweep -----------------------------------
// The reference validates against RBDL over 200 random configurations per
// robot (test_rbdl.cpp:107-300); this emits the same style of per-call
// oracle from the reference's own algorithms, incl. floating (quaternion)
// bases, for parity tests at scale.
static void random_dynamics_sweep(const char* urdf_path, const char* out_path,
                                  int n_cases, bool floating,
                                  unsigned long long seed, double q_scale,
                                  double qd_scale, int mm_every) {
  tds::World<Algebra> world;
  tds::NullLogger logger;
  tds::UrdfStructures<Algebra> urdf;
  int flags = 0;
  std::string text = read_file(urdf_path);
  if (!tds::UrdfParser<Algebra>::load_urdf_from_string(text, flags, logger,
                                                       urdf)) {
    printf("skipping %s (parse failed)\n", out_path);
    return;
  }
  tds::MultiBody<Algebra>* mb = world.create_multi_body("robot");
  tds::UrdfToMultiBody<Algebra>::convert_to_multi_body(urdf, world, *mb, 0);
  if (floating) mb->set_floating_base(true);
  mb->initialize();

  int n = mb->dof();
  int nd = mb->dof_qd();
  unsigned long long s = seed;
  auto rnd = [&s]() {
    s = s * 6364136223846793005ULL + 1442695040888963407ULL;
    return ((double)((s >> 33) & 0x7fffffff) / (double)0x40000000) - 1.0;
  };
  Vector3 gravity(0., 0., -9.81);

  FILE* out = fopen(out_path, "w");
  fprintf(out, "{\"dof\": %d, \"dof_qd\": %d, \"floating\": %s, \"cases\": [",
          n, nd, floating ? "true" : "false");
  for (int c = 0; c < n_cases; ++c) {
    for (int i = 0; i < n; ++i) mb->q(i) = q_scale * rnd();
    if (floating) {
      // base quaternion (q0..q3, xyzw) normalized, base position q4..q6
      double nq = 0;
      for (int k = 0; k < 4; ++k) nq += mb->q(k) * mb->q(k);
      nq = std::sqrt(nq);
      if (nq < 1e-9) { mb->q(3) = 1.0; nq = 1.0; }
      for (int k = 0; k < 4; ++k) mb->q(k) /= nq;
    }
    for (const auto& link : *mb) {
      if (link.joint_type == tds::JOINT_SPHERICAL) {
        int qi = link.q_index;
        double nq = 0;
        for (int k = 0; k < 4; ++k) nq += mb->q(qi + k) * mb->q(qi + k);
        nq = std::sqrt(nq);
        if (nq < 1e-9) { mb->q(qi + 3) = 1.0; nq = 1.0; }
        for (int k = 0; k < 4; ++k) mb->q(qi + k) /= nq;
      }
    }
    for (int i = 0; i < nd; ++i) mb->qd(i) = qd_scale * rnd();
    for (int i = 0; i < mb->dof_actuated(); ++i) mb->tau(i) = rnd();
    VectorX q = mb->q(), qd = mb->qd(), tau = mb->tau();
    tds::forward_dynamics(*mb, gravity);
    fprintf(out, "%s{\"q\": ", c ? "," : "");
    dump_vec(out, q);
    fprintf(out, ", \"qd\": ");
    dump_vec(out, qd);
    fprintf(out, ", \"tau\": ");
    dump_vec(out, tau);
    fprintf(out, ", \"qdd\": ");
    dump_vec(out, mb->qdd());
    if (floating) {
      // The default floating-base ABA above uses the reference's buggy
      // base-ABI block inverse (inertia.hpp:302-319, C=-H). Also emit the
      // rbdl_convention branch, whose dense 6x6 inverse is mathematically
      // correct (forward_dynamics.hpp:228-230), as the correct-math oracle
      // (output is in RBDL's hybrid acceleration convention).
      mb->q() = q; mb->qd() = qd; mb->tau() = tau;
      tds::forward_dynamics(*mb, gravity, /*rbdl_convention=*/true);
      fprintf(out, ", \"qdd_rbdl\": ");
      dump_vec(out, mb->qdd());
    }
    if (mm_every > 0 && c % mm_every == 0) {
      typename Algebra::MatrixX M(nd, nd);
      tds::mass_matrix(*mb, q, &M);
      fprintf(out, ", \"mass_matrix\": [");
      for (int i = 0; i < nd; ++i) {
        fprintf(out, "%s[", i ? "," : "");
        for (int j = 0; j < nd; ++j)
          fprintf(out, "%s%.17g", j ? "," : "", M(i, j));
        fprintf(out, "]");
      }
      fprintf(out, "]");
    }
    fprintf(out, "}");
  }
  fprintf(out, "]}\n");
  fclose(out);
  printf("wrote %s (%d cases)\n", out_path, n_cases);
}

// ---- floating-base (quaternion) robot on plane through the MLCP ------------
// Same env-loop ordering as pd_locomotion_golden, but with a true floating
// base: q(0..3) base quaternion xyzw, q(4..6) base position, PD joints
// after; tau index = qd_index - 6 (multi_body.hpp:557-570).
static void pd_floating_locomotion_golden(
    const char* urdf_path, const char* out_path,
    const std::vector<double>& poses, double kp, double kd, double max_force,
    double start_z, double dt, int steps, int snap_every) {
  tds::World<Algebra> world;
  tds::NullLogger logger;
  int flags = 0;

  tds::UrdfStructures<Algebra> plane_urdf;
  std::string plane_text = read_file("/root/reference/data/plane_implicit.urdf");
  tds::UrdfParser<Algebra>::load_urdf_from_string(plane_text, flags, logger,
                                                  plane_urdf);
  tds::MultiBody<Algebra>* plane_mb = world.create_multi_body("plane");
  tds::UrdfToMultiBody<Algebra>::convert_to_multi_body(plane_urdf, world,
                                                       *plane_mb, 0);
  plane_mb->initialize();

  tds::UrdfStructures<Algebra> urdf;
  std::string text = read_file(urdf_path);
  if (!tds::UrdfParser<Algebra>::load_urdf_from_string(text, flags, logger,
                                                       urdf)) {
    printf("skipping %s (parse failed)\n", out_path);
    return;
  }
  tds::MultiBody<Algebra>* mb = world.create_multi_body("robot");
  tds::UrdfToMultiBody<Algebra>::convert_to_multi_body(urdf, world, *mb, 0);
  mb->set_floating_base(true);
  mb->initialize();

  for (int i = 0; i < mb->dof(); ++i) mb->q(i) = 0.0;
  for (int i = 0; i < mb->dof_qd(); ++i) mb->qd(i) = 0.0;
  mb->q(3) = 1.0;      // identity base quaternion (xyzw)
  mb->q(6) = start_z;  // base height
  {
    size_t pose_index = 0;
    for (const auto& link : *mb) {
      if (link.joint_type != tds::JOINT_FIXED && pose_index < poses.size()) {
        mb->q(link.q_index) = poses[pose_index++];
      }
    }
  }

  Vector3 gravity(0., 0., -9.81);
  world.set_gravity(gravity);

  FILE* out = fopen(out_path, "w");
  fprintf(out, "{\"dt\": %.17g, \"kp\": %g, \"kd\": %g, \"max_force\": %g,"
               " \"floating\": true, \"snapshots\": {", dt, kp, kd, max_force);
  bool first = true;
  for (int t = 0; t <= steps; ++t) {
    if (t % snap_every == 0) {
      fprintf(out, "%s\"%d\": {\"q\": ", first ? "" : ",", t);
      dump_vec(out, mb->q());
      fprintf(out, ", \"qd\": ");
      dump_vec(out, mb->qd());
      fprintf(out, "}");
      first = false;
    }
    if (t == steps) break;
    size_t pose_index = 0;
    for (int i = 0; i < mb->dof_actuated(); ++i) mb->tau(i) = 0.0;
    for (const auto& link : *mb) {
      if (link.joint_type != tds::JOINT_FIXED && pose_index < poses.size()) {
        double err = poses[pose_index] - mb->q(link.q_index);
        double force = kp * err - kd * mb->qd(link.qd_index);
        if (force > max_force) force = max_force;
        if (force < -max_force) force = -max_force;
        mb->tau(link.qd_index - 6) = force;
        ++pose_index;
      }
    }
    tds::forward_dynamics(*mb, gravity);
    mb->clear_forces();
    tds::integrate_euler_qdd(*mb, dt);
    world.step(dt);
    tds::integrate_euler(*mb, dt);
  }
  fprintf(out, "}}\n");
  fclose(out);
  printf("wrote %s\n", out_path);
}

static void dump_vec(FILE* out, const VectorX& v) {
  fprintf(out, "[");
  for (int i = 0; i < Algebra::size(v); ++i)
    fprintf(out, "%s%.17g", i ? "," : "", v[i]);
  fprintf(out, "]");
}

int main(int argc, char** argv) {
  // ---- case 1: pendulum5 passive swing, dt=1e-3, 1000 steps --------------
  {
    tds::World<Algebra> world;
    tds::UrdfParser<Algebra> parser;
    tds::NullLogger logger;
    tds::UrdfStructures<Algebra> urdf;
    int flags = 0;
    std::string text = read_file("/root/reference/data/pendulum5.urdf");
    tds::UrdfParser<Algebra>::load_urdf_from_string(text, flags, logger, urdf);
    tds::MultiBody<Algebra>* mb = world.create_multi_body("pendulum5");
    tds::UrdfToMultiBody<Algebra>::convert_to_multi_body(urdf, world, *mb, 0);
    mb->initialize();

    // fixed initial state
    double q0[5] = {0.3, -0.2, 0.5, 0.1, -0.4};
    double qd0[5] = {0.0, 0.1, -0.1, 0.2, 0.0};
    for (int i = 0; i < 5; ++i) { mb->q(i) = q0[i]; mb->qd(i) = qd0[i]; }
    Vector3 gravity(0., 0., -9.81);
    double dt = 1e-3;

    FILE* out = fopen("tests/golden/pendulum5_swing.json", "w");
    fprintf(out, "{\"dt\": %.17g, \"gravity\": [0,0,-9.81], \"snapshots\": {", dt);
    bool first = true;
    for (int t = 0; t <= 1000; ++t) {
      if (t % 100 == 0) {
        fprintf(out, "%s\"%d\": {\"q\": ", first ? "" : ",", t);
        dump_vec(out, mb->q());
        fprintf(out, ", \"qd\": ");
        dump_vec(out, mb->qd());
        fprintf(out, "}");
        first = false;
      }
      if (t == 1000) break;
      tds::forward_dynamics(*mb, gravity);
      tds::integrate_euler(*mb, dt);
    }
    fprintf(out, "}}\n");
    fclose(out);
    printf("wrote pendulum5_swing.json\n");
  }

  // ---- case 2: ant leg URDF forward dynamics snapshots -------------------
  {
    tds::World<Algebra> world;
    tds::NullLogger logger;
    tds::UrdfStructures<Algebra> urdf;
    int flags = 0;
    std::string text =
        read_file("/root/reference/data/gym/ant_org_xyz_xyzrot.urdf");
    tds::UrdfParser<Algebra>::load_urdf_from_string(text, flags, logger, urdf);
    tds::MultiBody<Algebra>* mb = world.create_multi_body("ant");
    tds::UrdfToMultiBody<Algebra>::convert_to_multi_body(urdf, world, *mb, 0);
    mb->initialize();

    int n = mb->dof();
    int nd = mb->dof_qd();
    FILE* out = fopen("tests/golden/ant_dynamics.json", "w");
    fprintf(out, "{\"dof\": %d, \"dof_qd\": %d, \"cases\": [", n, nd);
    // deterministic pseudo-random states
    unsigned long long s = 12345;
    auto rnd = [&s]() {
      s = s * 6364136223846793005ULL + 1442695040888963407ULL;
      return ((double)((s >> 33) & 0x7fffffff) / (double)0x40000000) - 1.0;
    };
    Vector3 gravity(0., 0., -9.81);
    for (int c = 0; c < 5; ++c) {
      for (int i = 0; i < n; ++i) mb->q(i) = 0.4 * rnd();
      for (int i = 0; i < nd; ++i) mb->qd(i) = 0.5 * rnd();
      for (int i = 0; i < mb->dof_actuated(); ++i) mb->tau(i) = rnd();
      VectorX q = mb->q(), qd = mb->qd(), tau = mb->tau();
      tds::forward_dynamics(*mb, gravity);
      fprintf(out, "%s{\"q\": ", c ? "," : "");
      dump_vec(out, q);
      fprintf(out, ", \"qd\": ");
      dump_vec(out, qd);
      fprintf(out, ", \"tau\": ");
      dump_vec(out, tau);
      fprintf(out, ", \"qdd\": ");
      dump_vec(out, mb->qdd());
      // mass matrix too
      typename Algebra::MatrixX M(nd, nd);
      tds::mass_matrix(*mb, q, &M);
      fprintf(out, ", \"mass_matrix\": [");
      for (int i = 0; i < nd; ++i) {
        fprintf(out, "%s[", i ? "," : "");
        for (int j = 0; j < nd; ++j)
          fprintf(out, "%s%.17g", j ? "," : "", M(i, j));
        fprintf(out, "]");
      }
      fprintf(out, "]}");
    }
    fprintf(out, "]}\n");
    fclose(out);
    printf("wrote ant_dynamics.json\n");
  }
  // ---- case 2b: sphere dropped on plane THROUGH the MLCP contact solver --
  {
    tds::World<Algebra> world;
    tds::NullLogger logger;
    int flags = 0;

    // plane
    tds::UrdfStructures<Algebra> plane_urdf;
    std::string plane_text =
        read_file("/root/reference/data/plane_implicit.urdf");
    tds::UrdfParser<Algebra>::load_urdf_from_string(plane_text, flags, logger,
                                                    plane_urdf);
    tds::MultiBody<Algebra>* plane_mb = world.create_multi_body("plane");
    tds::UrdfToMultiBody<Algebra>::convert_to_multi_body(plane_urdf, world,
                                                         *plane_mb, 0);
    plane_mb->initialize();

    // floating sphere
    const char* sphere_text = R"(<?xml version="1.0"?>
<robot name="golden_sphere">
  <link name="base">
    <inertial><origin rpy="0 0 0" xyz="0 0 0"/><mass value="1.5"/>
      <inertia ixx="0.024" ixy="0" ixz="0" iyy="0.024" iyz="0" izz="0.024"/></inertial>
    <collision><geometry><sphere radius="0.2"/></geometry></collision>
  </link>
</robot>)";
    tds::UrdfStructures<Algebra> ball_urdf;
    tds::UrdfParser<Algebra>::load_urdf_from_string(sphere_text, flags, logger,
                                                    ball_urdf);
    tds::MultiBody<Algebra>* ball = world.create_multi_body("ball");
    tds::UrdfToMultiBody<Algebra>::convert_to_multi_body(ball_urdf, world,
                                                         *ball, 0);
    ball->set_floating_base(true);
    ball->initialize();

    // drop with sideways velocity so friction rows activate
    ball->q(4) = 0.0; ball->q(5) = 0.0; ball->q(6) = 0.35;
    ball->qd(3) = 1.0; ball->qd(4) = -0.5; ball->qd(5) = 0.0;
    ball->qd(0) = 0.3;

    Vector3 gravity(0., 0., -9.81);
    world.set_gravity(gravity);
    double dt = 1e-3;

    FILE* out = fopen("tests/golden/sphere_contact_trajectory.json", "w");
    fprintf(out, "{\"dt\": %.17g, \"snapshots\": {", dt);
    bool first = true;
    for (int t = 0; t <= 500; ++t) {
      if (t % 50 == 0) {
        fprintf(out, "%s\"%d\": {\"q\": ", first ? "" : ",", t);
        dump_vec(out, ball->q());
        fprintf(out, ", \"qd\": ");
        dump_vec(out, ball->qd());
        fprintf(out, "}");
        first = false;
      }
      if (t == 500) break;
      // the env-loop ordering (locomotion_contact_simulation.h:259-271)
      tds::forward_dynamics(*ball, gravity);
      ball->clear_forces();
      tds::integrate_euler_qdd(*ball, dt);
      world.step(dt);
      tds::integrate_euler(*ball, dt);
    }
    fprintf(out, "}}\n");
    fclose(out);
    printf("wrote sphere_contact_trajectory.json\n");
  }

  // ---- case 3: spherical-joint humanoid forward dynamics -----------------
  {
    tds::World<Algebra> world;
    tds::NullLogger logger;
    tds::UrdfStructures<Algebra> urdf;
    int flags = 0;
    std::string text =
        read_file("/root/reference/data/humanoid_xyz_spherical.urdf");
    tds::MultiBody<Algebra>* mb = nullptr;
    if (!tds::UrdfParser<Algebra>::load_urdf_from_string(text, flags, logger,
                                                         urdf)) {
      printf("skipping humanoid case (parse failed)\n");
      return 0;
    }
    mb = world.create_multi_body("humanoid");
    tds::UrdfToMultiBody<Algebra>::convert_to_multi_body(urdf, world, *mb, 0);
    mb->initialize();

    int n = mb->dof();
    int nd = mb->dof_qd();
    FILE* out = fopen("tests/golden/humanoid_spherical_dynamics.json", "w");
    fprintf(out, "{\"dof\": %d, \"dof_qd\": %d, \"cases\": [", n, nd);
    unsigned long long s = 777;
    auto rnd = [&s]() {
      s = s * 6364136223846793005ULL + 1442695040888963407ULL;
      return ((double)((s >> 33) & 0x7fffffff) / (double)0x40000000) - 1.0;
    };
    Vector3 gravity(0., 0., -9.81);
    for (int c = 0; c < 4; ++c) {
      // randomize joints; re-normalize every spherical quaternion
      for (int i = 0; i < n; ++i) mb->q(i) = 0.3 * rnd();
      for (const auto& link : *mb) {
        if (link.joint_type == tds::JOINT_SPHERICAL) {
          int qi = link.q_index;
          double nq = 0;
          for (int k = 0; k < 4; ++k) nq += mb->q(qi + k) * mb->q(qi + k);
          nq = std::sqrt(nq);
          if (nq < 1e-9) { mb->q(qi + 3) = 1.0; nq = 1.0; }
          for (int k = 0; k < 4; ++k) mb->q(qi + k) /= nq;
        }
      }
      for (int i = 0; i < nd; ++i) mb->qd(i) = 0.4 * rnd();
      for (int i = 0; i < mb->dof_actuated(); ++i) mb->tau(i) = 0.5 * rnd();
      VectorX q = mb->q(), qd = mb->qd(), tau = mb->tau();
      tds::forward_dynamics(*mb, gravity);
      fprintf(out, "%s{\"q\": ", c ? "," : "");
      dump_vec(out, q);
      fprintf(out, ", \"qd\": ");
      dump_vec(out, qd);
      fprintf(out, ", \"tau\": ");
      dump_vec(out, tau);
      fprintf(out, ", \"qdd\": ");
      dump_vec(out, mb->qdd());
      fprintf(out, "}");
    }
    fprintf(out, "]}\n");
    fclose(out);
    printf("wrote humanoid_spherical_dynamics.json\n");
  }

  // ---- case 4: PD-driven laikago on plane, 500 steps through the MLCP ----
  pd_locomotion_golden(
      "/root/reference/data/laikago/laikago_toes_zup_xyz_xyzrot.urdf",
      "tests/golden/laikago_pd_contact_trajectory.json",
      {0.2, 0.0, -0.7, 0.2, 0.0, -0.7, 0.2, 0.0, -0.7, 0.2, 0.0, -0.7},
      100.0, 2.0, 50.0, /*start_z=*/0.48, /*dt=*/1e-3, /*steps=*/500,
      /*snap_every=*/50);

  // ---- case 5: PD-driven ant on plane -------------------------------------
  pd_locomotion_golden(
      "/root/reference/data/gym/ant_org_xyz_xyzrot.urdf",
      "tests/golden/ant_pd_contact_trajectory.json",
      {0.0, -0.5, 0.0, -0.5, 0.0, -0.5, 0.0, -0.5},
      15.0, 0.3, 3.0, /*start_z=*/0.48, /*dt=*/0.01, /*steps=*/500,
      /*snap_every=*/50);

  // ---- case 6: random-config ABA+CRBA sweeps (test_rbdl.cpp scale) --------
  random_dynamics_sweep("/root/reference/data/gym/ant_org_xyz_xyzrot.urdf",
                        "tests/golden/ant_random_sweep.json",
                        /*n_cases=*/150, /*floating=*/false, /*seed=*/2024,
                        /*q_scale=*/0.5, /*qd_scale=*/0.6, /*mm_every=*/15);
  random_dynamics_sweep("/root/reference/data/laikago/laikago_toes_zup.urdf",
                        "tests/golden/laikago_floating_random_sweep.json",
                        /*n_cases=*/150, /*floating=*/true, /*seed=*/4711,
                        /*q_scale=*/0.5, /*qd_scale=*/0.6, /*mm_every=*/15);
  random_dynamics_sweep("/root/reference/data/humanoid_xyz_spherical.urdf",
                        "tests/golden/humanoid_spherical_random_sweep.json",
                        /*n_cases=*/100, /*floating=*/false, /*seed=*/999,
                        /*q_scale=*/0.4, /*qd_scale=*/0.5, /*mm_every=*/0);
  // the robot from the reference's own (commented-out) RBDL list,
  // test_rbdl.cpp:303-304
  random_dynamics_sweep("/root/reference/data/swimmer/swimmer05/swimmer05.urdf",
                        "tests/golden/swimmer_random_sweep.json",
                        /*n_cases=*/100, /*floating=*/false, /*seed=*/31337,
                        /*q_scale=*/0.5, /*qd_scale=*/0.6, /*mm_every=*/20);

  // ---- case 7: floating-base (quaternion) laikago through the MLCP --------
  pd_floating_locomotion_golden(
      "/root/reference/data/laikago/laikago_toes_zup.urdf",
      "tests/golden/laikago_floating_contact_trajectory.json",
      {0.2, 0.0, -0.7, 0.2, 0.0, -0.7, 0.2, 0.0, -0.7, 0.2, 0.0, -0.7},
      100.0, 2.0, 50.0, /*start_z=*/0.48, /*dt=*/1e-3, /*steps=*/500,
      /*snap_every=*/50);
  return 0;
}

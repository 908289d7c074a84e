"""Visualization / interactive query.

Reference behavior: /root/reference/ovo/entities/visualizer.py (an Open3D
GUI app streaming the live map + free-text query heatmaps). Open3D does not
ship in this image, so the viewer degrades gracefully:

  - with open3d installed: interactive point-cloud window with instance /
    RGB / query-heatmap coloring and a text-query loop on stdin;
  - headless: exports colored PLY snapshots + similarity-colored clouds so
    runs remain inspectable (the capability the reference's GUI provides,
    minus the window).

Instance colors use the same tab20-cycled mapping as the reference
(vis_utils.py:105-107).
"""
from __future__ import annotations

import struct
from pathlib import Path
from typing import Optional, Sequence, Tuple

import numpy as np

try:
    import open3d as o3d  # noqa: F401

    _HAS_O3D = True
except ImportError:
    _HAS_O3D = False

_TAB20 = np.array([
    [31, 119, 180], [174, 199, 232], [255, 127, 14], [255, 187, 120],
    [44, 160, 44], [152, 223, 138], [214, 39, 40], [255, 152, 150],
    [148, 103, 189], [197, 176, 213], [140, 86, 75], [196, 156, 148],
    [227, 119, 194], [247, 182, 210], [127, 127, 127], [199, 199, 199],
    [188, 189, 34], [219, 219, 141], [23, 190, 207], [158, 218, 229],
], dtype=np.uint8)


def instance_colors(obj_ids: np.ndarray) -> np.ndarray:
    """tab20-cycled per-instance colors; unassigned points grey."""
    colors = _TAB20[np.abs(obj_ids) % len(_TAB20)]
    colors[obj_ids < 0] = 128
    return colors


def heatmap_colors(values: np.ndarray, threshold: float = 0.0) -> np.ndarray:
    """Viridis-style heat coloring of similarity values in [0,1]."""
    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import cm

    v = np.clip(values, 0.0, 1.0)
    rgba = cm.viridis(v)
    rgb = (rgba[:, :3] * 255).astype(np.uint8)
    rgb[values < threshold] = 60
    return rgb


def write_ply(path, points: np.ndarray, colors: np.ndarray) -> None:
    points = np.asarray(points, np.float32)
    colors = np.asarray(colors, np.uint8)
    with open(path, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n")
        f.write(f"element vertex {len(points)}\n".encode())
        f.write(b"property float x\nproperty float y\nproperty float z\n")
        f.write(b"property uchar red\nproperty uchar green\n"
                b"property uchar blue\nend_header\n")
        for p, c in zip(points, colors):
            f.write(struct.pack("<fffBBB", p[0], p[1], p[2],
                                c[0], c[1], c[2]))


def export_colored_pcd(output_dir, points, obj_ids, rgb_colors=None,
                       query_values=None, tag: str = "map") -> None:
    """Headless snapshot set: instance-colored, RGB, and optional
    query-heatmap clouds."""
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    points = np.asarray(points)
    obj_ids = np.asarray(obj_ids).reshape(-1)
    write_ply(out / f"{tag}_instances.ply", points, instance_colors(obj_ids))
    if rgb_colors is not None:
        write_ply(out / f"{tag}_rgb.ply", points, np.asarray(rgb_colors))
    if query_values is not None:
        write_ply(out / f"{tag}_query.ply", points,
                  heatmap_colors(np.asarray(query_values)))


def instance_obbs(points: np.ndarray, obj_ids: np.ndarray) -> dict:
    """Per-instance oriented bounding boxes (reference visualizer.py:401-599
    ``visualize_3d_points_obj_id_and_obb`` uses open3d OBBs; here: PCA-
    aligned boxes computed directly). Returns {id: {center, axes (3,3 rows =
    directions), extent (3,)}}."""
    out = {}
    for ins_id in np.unique(obj_ids):
        if ins_id < 0:
            continue
        pts = points[obj_ids == ins_id]
        if len(pts) < 4:
            continue
        c = pts.mean(axis=0)
        x = pts - c
        cov = x.T @ x / len(x)
        w, v = np.linalg.eigh(cov)          # ascending eigenvalues
        axes = v.T[::-1]                     # rows: major->minor directions
        proj = x @ axes.T
        lo, hi = proj.min(axis=0), proj.max(axis=0)
        center = c + 0.5 * (lo + hi) @ axes
        out[int(ins_id)] = {"center": center, "axes": axes,
                            "extent": (hi - lo)}
    return out


def obb_corners(obb: dict) -> np.ndarray:
    """(8, 3) world-space corners of one OBB."""
    signs = np.array([[sx, sy, sz] for sx in (-.5, .5) for sy in (-.5, .5)
                      for sz in (-.5, .5)])
    return obb["center"] + (signs * obb["extent"]) @ obb["axes"]


_OBB_EDGES = [(0, 1), (0, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 7),
              (6, 7), (0, 4), (1, 5), (2, 6), (3, 7)]


def export_obb_lineset(path, obbs: dict, samples_per_edge: int = 24) -> None:
    """Headless OBB view: wireframes rendered as dense point samples along
    the 12 edges of each box (PLY points are viewer-agnostic)."""
    pts, cols = [], []
    t = np.linspace(0.0, 1.0, samples_per_edge)[:, None]
    for ins_id, obb in obbs.items():
        corners = obb_corners(obb)
        color = instance_colors(np.array([ins_id]))[0]
        for a, b in _OBB_EDGES:
            seg = corners[a] * (1 - t) + corners[b] * t
            pts.append(seg)
            cols.append(np.tile(color, (samples_per_edge, 1)))
    if not pts:
        return
    write_ply(path, np.concatenate(pts), np.concatenate(cols))


def camera_frustum_lineset(c2w: np.ndarray, K: np.ndarray,
                           hw: Tuple[int, int], depth: float = 0.3
                           ) -> Tuple[np.ndarray, np.ndarray]:
    """Camera frustum wireframe in world coords (reference
    vis_utils.py:118-158): optical center + the 4 image-plane corners at
    ``depth``, 8 lines (4 center->corner rays + the corner ring).
    Returns (points (5, 3) f64, lines (8, 2) i32)."""
    h, w = hw
    corners_px = np.array([[0, 0], [w, 0], [w, h], [0, h]], np.float64)
    x = (corners_px[:, 0] - K[0, 2]) * depth / K[0, 0]
    y = (corners_px[:, 1] - K[1, 2]) * depth / K[1, 1]
    cam = np.stack([x, y, np.full(4, depth)], axis=1)
    pts = np.concatenate([np.zeros((1, 3)), cam], axis=0)
    pts = pts @ np.asarray(c2w, np.float64)[:3, :3].T + \
        np.asarray(c2w, np.float64)[:3, 3]
    lines = np.array([[0, 1], [0, 2], [0, 3], [0, 4],
                      [1, 2], [2, 3], [3, 4], [4, 1]], np.int32)
    return pts, lines


def export_frustum_lineset(path, c2w: np.ndarray, K: np.ndarray,
                           hw: Tuple[int, int], depth: float = 0.3,
                           samples_per_edge: int = 24) -> None:
    """Headless frustum export: edge-sampled points as a PLY (same style
    as export_obb_lineset)."""
    pts, lines = camera_frustum_lineset(c2w, K, hw, depth)
    t = np.linspace(0.0, 1.0, samples_per_edge)[:, None]
    seg = [pts[a][None] * (1 - t) + pts[b][None] * t for a, b in lines]
    samples = np.concatenate(seg, axis=0)
    colors = np.tile(np.array([[255, 64, 64]], np.uint8),
                     (len(samples), 1))
    write_ply(path, samples.astype(np.float32), colors)


def stream_pcd(queue, conn, flag, output_dir, show: bool = False,
               queries: Optional[Sequence[str]] = None, cam=None) -> None:
    """Viewer-process target (reference visualizer.py:324-393 stream loop +
    :146-162 query handshake). Consumes (points, obj_ids, colors) frames
    from ``queue`` until a ``None`` sentinel. Headless mode: optionally
    issues scripted ``queries`` through the cross-process protocol
    (conn.send(query); flag=1 -> wait flag=2 -> conn.recv(per-point sims))
    and exports colored PLY snapshots of the final map.

    ``cam``: optional (K 3x3, H, W) -- with it, stream items may carry a
    4th element (the current c2w) and the viewer draws/export the camera
    frustum lineset (reference visualizer.py frustum updates).

    With open3d installed the same loop drives a live window instead.
    """
    try:
        _stream_pcd(queue, conn, flag, output_dir, show, queries, cam)
    except Exception:  # noqa: BLE001 -- subprocess: leave a diagnosable trace
        import traceback

        out = Path(output_dir)
        out.mkdir(parents=True, exist_ok=True)
        (out / "viewer_err.txt").write_text(traceback.format_exc())
        raise


def _stream_pcd(queue, conn, flag, output_dir, show: bool = False,
                queries: Optional[Sequence[str]] = None, cam=None) -> None:
    import time

    queries = list(queries or [])
    latest = None
    last_pose = None
    out = Path(output_dir)
    vis_window = None
    frustum_geom = None
    if show and _HAS_O3D:
        import open3d as o3d

        vis_window = o3d.visualization.Visualizer()
        vis_window.create_window()
        pcd_geom = o3d.geometry.PointCloud()

    n_frames = 0
    query_results = []
    while True:
        item = queue.get()
        if item is None:
            break
        latest = item[:3]
        if len(item) > 3 and item[3] is not None:
            last_pose = np.asarray(item[3], np.float64)
        n_frames += 1
        if vis_window is not None:
            import open3d as o3d

            pts, obj_ids, _ = latest
            pcd_geom.points = o3d.utility.Vector3dVector(
                np.asarray(pts, np.float64))
            pcd_geom.colors = o3d.utility.Vector3dVector(
                instance_colors(np.asarray(obj_ids)).astype(np.float64)
                / 255.0)
            if n_frames == 1:
                vis_window.add_geometry(pcd_geom)
            vis_window.update_geometry(pcd_geom)
            if last_pose is not None and cam is not None:
                K, h, w = cam
                fpts, flines = camera_frustum_lineset(last_pose,
                                                      np.asarray(K), (h, w))
                if frustum_geom is None:
                    frustum_geom = o3d.geometry.LineSet()
                    frustum_geom.lines = o3d.utility.Vector2iVector(flines)
                    frustum_geom.paint_uniform_color([1.0, 0.25, 0.25])
                frustum_geom.points = o3d.utility.Vector3dVector(fpts)
                if n_frames == 1:
                    vis_window.add_geometry(frustum_geom)
                vis_window.update_geometry(frustum_geom)
            vis_window.poll_events()
            vis_window.update_renderer()
        if queries:
            q = queries.pop(0)
            # drain any stale reply from a previously timed-out query so a
            # late mapper answer is never attributed to this query
            while conn.poll(0):
                conn.recv()
            conn.send(q)
            with flag.get_lock():
                flag.value = 1
            t0 = time.time()
            while time.time() - t0 < 60.0:
                with flag.get_lock():
                    done = flag.value == 2
                if done:
                    break
                time.sleep(0.005)
            if done and conn.poll(5.0):
                vals = conn.recv()
                query_results.append((q, np.asarray(vals)))
            with flag.get_lock():
                flag.value = 0

    if latest is not None:
        pts, obj_ids, colors = latest
        export_colored_pcd(out, pts, obj_ids, colors, tag="stream_final")
        for q, vals in query_results:
            export_colored_pcd(out, pts, obj_ids, query_values=vals,
                               tag=f"stream_query_{q.replace(' ', '_')}")
        if last_pose is not None and cam is not None:
            K, h, w = cam
            out.mkdir(parents=True, exist_ok=True)
            export_frustum_lineset(out / "stream_frustum.ply", last_pose,
                                   np.asarray(K), (h, w))
    if vis_window is not None:
        vis_window.destroy_window()


class Visualizer:
    """Interactive (open3d) or headless-export viewer over a finished run."""

    def __init__(self, semantic_mapper=None, output_dir: str = "vis_out"):
        self.ovo = semantic_mapper
        self.output_dir = Path(output_dir)

    def query_values_per_point(self, obj_ids: np.ndarray, query: str
                               ) -> np.ndarray:
        sim = self.ovo.query([query])[:, 0]
        ids = self.ovo.active_ids()
        lut = np.zeros(int(ids.max()) + 2 if len(ids) else 1, np.float32)
        lut[ids] = np.clip(sim, 0.0, 1.0)
        vals = np.where(obj_ids >= 0,
                        lut[np.clip(obj_ids, 0, len(lut) - 1)], 0.0)
        return vals

    def visualize_and_query(self, points, obj_ids, colors=None,
                            queries: Optional[Sequence[str]] = None,
                            show_obbs: bool = False,
                            interactive: bool = False) -> None:
        """``interactive=True`` requests the GUI query app explicitly
        (reference --visualize_interactive_query); without open3d it
        degrades to the headless PLY exports with a warning."""
        points = np.asarray(points)
        obj_ids = np.asarray(obj_ids).reshape(-1)
        if show_obbs:
            self.output_dir.mkdir(parents=True, exist_ok=True)
            export_obb_lineset(self.output_dir / "map_obbs.ply",
                               instance_obbs(points, obj_ids))
        if interactive and not _HAS_O3D:
            print("[viz] --visualize_interactive_query requested but open3d "
                  "is unavailable; falling back to headless PLY exports")
        if not _HAS_O3D:
            export_colored_pcd(self.output_dir, points, obj_ids, colors)
            for q in queries or []:
                vals = self.query_values_per_point(obj_ids, q)
                export_colored_pcd(self.output_dir, points, obj_ids,
                                   query_values=vals,
                                   tag=f"query_{q.replace(' ', '_')}")
            print(f"[viz] open3d unavailable; wrote PLY snapshots to "
                  f"{self.output_dir}")
            return
        app = InteractiveViewer(self, points, obj_ids, colors,
                                output_dir=self.output_dir)
        app.run()


class InteractiveViewer:
    """Open3D GUI query app over a finished run (reference
    visualizer.py:16-399 surface): an O3DVisualizer window plus a widget
    panel with a text query box, similarity-threshold slider,
    instance/RGB color toggle, hide-ceiling toggle, reset button, and
    snapshot / camera-pose persistence actions. Queries run against the
    live SemanticMapper and recolor the cloud as a heatmap above the
    threshold.

    Only constructed when open3d is importable; `Visualizer`
    degrades to the headless PLY exports otherwise. Manual smoke
    instructions live in README.md (no GUI in CI)."""

    def __init__(self, viz: "Visualizer", points, obj_ids, colors,
                 output_dir: Path):
        import open3d as o3d
        import open3d.visualization.gui as gui

        self.o3d, self.gui = o3d, gui
        self.viz = viz
        self.points = np.asarray(points, np.float64)
        self.obj_ids = np.asarray(obj_ids).reshape(-1)
        self.rgb = (np.asarray(colors, np.float64) / 255.0
                    if colors is not None else None)
        self.inst_rgb = instance_colors(self.obj_ids).astype(np.float64) / 255
        self.output_dir = Path(output_dir)
        self.output_dir.mkdir(parents=True, exist_ok=True)
        self.th = 0.5
        self.query = ""
        self.show_instances = self.rgb is None
        self.hide_ceiling = False
        self._query_vals = None
        self._n_snap = 0
        # ceiling = points above the 95th height percentile (gravity -y:
        # smallest y values in camera-up convention)
        y = self.points[:, 1]
        self._ceiling_mask = y < np.percentile(y, 5.0)

        app = gui.Application.instance
        app.initialize()
        self.app = app
        self.win = o3d.visualization.O3DVisualizer("ovo-tpu viewer",
                                                   1280, 720)
        self.win.add_action("Take snapshot", self._take_snapshot)
        self.win.add_action("Save cam pose", self._save_campose)
        self.win.add_action("Load cam pose", self._load_campose)
        app.add_window(self.win)
        self._build_widgets()
        self._refresh()

    # -- widget panel (reference create_widgets_window) ------------------
    def _build_widgets(self) -> None:
        gui = self.gui
        w = gui.Application.instance.create_window("Query options", 420, 170)
        em = w.theme.font_size
        layout = gui.Vert(0, gui.Margins(*([0.5 * em] * 4)))

        self._query_in = gui.TextEdit()
        self._query_in.set_on_value_changed(self._on_query_text)
        btn = gui.Button("Update query")
        btn.set_on_clicked(self._on_update)
        btn.vertical_padding_em = 0
        row = gui.Horiz()
        row.add_child(gui.Label("Query: "))
        row.add_child(self._query_in)
        row.add_fixed(0.25 * em)
        row.add_child(btn)
        layout.add_child(row)

        sl = gui.Slider(gui.Slider.DOUBLE)
        sl.set_limits(0.0, 1.0)
        sl.double_value = self.th
        sl.set_on_value_changed(self._on_th)
        row2 = gui.Horiz()
        row2.add_child(gui.Label("Similarity th: "))
        row2.add_child(sl)
        layout.add_child(row2)

        cb = gui.Checkbox("Show object instances")
        cb.checked = self.show_instances
        cb.set_on_checked(self._on_instances)
        layout.add_child(cb)

        cbc = gui.Checkbox("Hide ceiling")
        cbc.checked = self.hide_ceiling
        cbc.set_on_checked(self._on_ceiling)
        layout.add_child(cbc)

        rst = gui.Button("Reset vis")
        rst.vertical_padding_em = 0
        rst.set_on_clicked(self._on_reset)
        layout.add_child(rst)
        w.add_child(layout)

    # -- callbacks -------------------------------------------------------
    def _on_query_text(self, text):
        self.query = str(text)

    def _on_th(self, value):
        self.th = float(value)
        self._refresh()

    def _on_update(self):
        if self.query and self.viz.ovo is not None:
            self._query_vals = self.viz.query_values_per_point(
                self.obj_ids, self.query)
        self._refresh()

    def _on_instances(self, checked):
        self.show_instances = bool(checked)
        self._refresh()

    def _on_ceiling(self, checked):
        self.hide_ceiling = bool(checked)
        self._refresh()

    def _on_reset(self):
        self._query_vals = None
        self._query_in.text_value = ""
        self.query = ""
        self._refresh()

    def _take_snapshot(self, vis=None):
        path = str(self.output_dir / f"snapshot_{self._n_snap:03d}.png")
        self._n_snap += 1
        self.win.export_current_image(path)

    def _save_campose(self, vis=None):
        import json

        cam = self.win.scene.camera
        mat = np.asarray(cam.get_model_matrix()).tolist()
        with open(self.output_dir / "campose.json", "w") as f:
            json.dump(mat, f)

    def _load_campose(self, vis=None):
        import json

        p = self.output_dir / "campose.json"
        if not p.exists():
            return
        mat = np.asarray(json.load(open(p)), np.float32)
        self.win.scene.camera.set_model_matrix(mat)

    # -- drawing ---------------------------------------------------------
    def _current_colors(self) -> np.ndarray:
        if self._query_vals is not None:
            return heatmap_colors(self._query_vals,
                                  self.th).astype(np.float64) / 255.0
        if self.show_instances or self.rgb is None:
            return self.inst_rgb
        return self.rgb

    def _refresh(self) -> None:
        o3d = self.o3d
        keep = (~self._ceiling_mask if self.hide_ceiling
                else np.ones(len(self.points), bool))
        pcd = o3d.geometry.PointCloud()
        pcd.points = o3d.utility.Vector3dVector(self.points[keep])
        pcd.colors = o3d.utility.Vector3dVector(
            self._current_colors()[keep])
        self.win.remove_geometry("pcd")
        self.win.add_geometry("pcd", pcd)

    def run(self) -> None:
        self.app.run()

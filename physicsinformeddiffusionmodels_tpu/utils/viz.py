"""Visualization / artifact writers (PNG, CSV, GIF).

Host-side equivalents of the reference's dump helpers
(`/root/reference/src/denoising_utils.py:221-271`, `main.py:241-311`):
scatter panels of the denoising trajectory for the toy study, grayscale field
images with residual annotations for the image studies, and GIF writers.
matplotlib/imageio are imported lazily so the compute path never depends on
them.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def _mpl():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def save_scatter_panels(
    history: np.ndarray,
    eval_steps,
    out_path: str,
    n_steps: int,
    extra_histories: dict | None = None,
    fix_axes: bool = True,
):
    """Toy-study panel plot: scatter of the sample cloud at selected steps
    (`main_toy.py:154-177`). ``history`` is [T(+1), N, 2] host array."""
    plt = _mpl()
    k = len(eval_steps)
    fig, axs = plt.subplots(1, k, figsize=(3 * k - 3, 3))
    x_lim = y_lim = None
    series = {"sample": history}
    if extra_histories:
        series.update(extra_histories)
    for label, hist in series.items():
        for i_idx, i in enumerate(eval_steps):
            cur = np.asarray(hist[min(i, len(hist) - 1)])
            if fix_axes and x_lim is None:
                x_lim = (cur[:, 0].min(), cur[:, 0].max())
                y_lim = (cur[:, 1].min(), cur[:, 1].max())
            ax = axs[i_idx] if k > 1 else axs
            ax.set_xlim(x_lim)
            ax.set_ylim(y_lim)
            ax.scatter(cur[:, 0], cur[:, 1], s=10, label=label)
            ax.set_title(f"$q(x_{{{n_steps - i}}})$")
            if i_idx == 0:
                ax.legend()
    Path(out_path).parent.mkdir(parents=True, exist_ok=True)
    plt.savefig(out_path)
    plt.close(fig)


def save_field_image(
    field: np.ndarray,
    out_path: str,
    title: str | None = None,
):
    """Grayscale min-max-normalized field image (`main.py:257-275`)."""
    plt = _mpl()
    lo, hi = field.min(), field.max()
    norm = (field - lo) / (hi - lo) if hi > lo else np.zeros_like(field)
    image = np.uint8(norm * 255)
    fig, ax = plt.subplots()
    ax.imshow(image, cmap="gray", vmin=0, vmax=255)
    ax.axis("off")
    if title:
        plt.title(title, color="green")
    Path(out_path).parent.mkdir(parents=True, exist_ok=True)
    plt.savefig(out_path, bbox_inches="tight", pad_inches=0)
    plt.close(fig)


def save_csv(array: np.ndarray, out_path: str):
    Path(out_path).parent.mkdir(parents=True, exist_ok=True)
    np.savetxt(out_path, np.asarray(array), delimiter=",")


def image_history_to_gif(
    history: np.ndarray,
    out_path: str,
    frame_duration: float = 0.05,
    normalization_mode: str = "final_pred",
):
    """GIF of a [T, H, W] field trajectory (`denoising_utils.py:244-271`)."""
    import imageio

    history = np.asarray(history)
    if normalization_mode == "final_pred":
        lo, hi = history[-1].min(), history[-1].max()
    elif normalization_mode == "global":
        lo, hi = history.min(), history.max()
    else:
        lo, hi = None, None
    Path(out_path).parent.mkdir(parents=True, exist_ok=True)
    with imageio.get_writer(out_path, mode="I", duration=frame_duration) as writer:
        for frame in history:
            if normalization_mode == "individual":
                lo, hi = frame.min(), frame.max()
            if lo is not None:
                frame = np.uint8(np.clip((frame - lo) / (hi - lo + 1e-12), 0, 1) * 255)
            writer.append_data(frame)


def scatter_history_to_gif(
    history: np.ndarray,
    out_path: str,
    x_lim,
    y_lim,
    label: str | None = None,
    duration: float = 0.05,
):
    """GIF of a [T, N, 2] point-cloud trajectory (`denoising_utils.py:221-242`)."""
    import imageio

    plt = _mpl()
    Path(out_path).parent.mkdir(parents=True, exist_ok=True)
    with imageio.get_writer(out_path, mode="I", duration=duration, loop=1) as writer:
        for step in range(history.shape[0]):
            fig, ax = plt.subplots()
            ax.scatter(history[step, :, 0], history[step, :, 1], s=10)
            ax.set_xlim(x_lim)
            ax.set_ylim(y_lim)
            if label:
                ax.set_title(label)
            fig.canvas.draw()
            buf = np.asarray(fig.canvas.buffer_rgba())[..., :3]
            writer.append_data(buf)
            plt.close(fig)

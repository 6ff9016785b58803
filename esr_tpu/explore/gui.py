"""Qt GUI editor (SURVEY.md §2.16: the reference's ``codes/GUI_SR.py``
capability), as a thin front-end over :class:`ExplorationSession`.

PyQt5/PySide6 are not present in this TPU image, so the module import-guards
the Qt dependency; all editing logic lives in the headless session (tested),
keeping this layer to widgets + event wiring. Launch::

    python -m esr_tpu.explore.gui -opt OPTIONS.json --lr image.png
"""

from __future__ import annotations

import argparse

import numpy as np


def _require_qt():
    try:
        from PyQt5 import QtCore, QtGui, QtWidgets  # type: ignore

        return QtCore, QtGui, QtWidgets
    except ImportError:
        try:
            from PySide6 import QtCore, QtGui, QtWidgets  # type: ignore

            return QtCore, QtGui, QtWidgets
        except ImportError as e:
            raise RuntimeError(
                "No Qt binding available (PyQt5/PySide6). Use the terminal "
                "editor instead: python -m esr_tpu.explore.cli"
            ) from e


def launch(session) -> None:
    """Run the editor event loop around an ExplorationSession."""
    QtCore, QtGui, QtWidgets = _require_qt()
    from esr_tpu.ops.color import tensor2img

    app = QtWidgets.QApplication([])
    win = QtWidgets.QMainWindow()
    win.setWindowTitle("Explorable SR (TPU)")

    label = QtWidgets.QLabel()
    label.setScaledContents(False)
    rubber = QtWidgets.QRubberBand(QtWidgets.QRubberBand.Rectangle, label)
    origin = {}

    def refresh():
        img = tensor2img(session.current_sr()[0])
        h, w, _ = img.shape
        qimg = QtGui.QImage(
            np.ascontiguousarray(img).data, w, h, 3 * w, QtGui.QImage.Format_RGB888
        )
        label.setPixmap(QtGui.QPixmap.fromImage(qimg))

    def on_press(ev):
        origin["pos"] = ev.pos()
        rubber.setGeometry(QtCore.QRect(ev.pos(), QtCore.QSize()))
        rubber.show()

    def on_move(ev):
        if "pos" in origin:
            rubber.setGeometry(QtCore.QRect(origin["pos"], ev.pos()).normalized())

    def on_release(ev):
        rect = rubber.geometry()
        session.select_rect(rect.top(), rect.left(), rect.bottom(), rect.right())

    label.mousePressEvent = on_press
    label.mouseMoveEvent = on_move
    label.mouseReleaseEvent = on_release

    toolbar = win.addToolBar("tools")
    tools = [
        ("Var +", session.increase_variance),
        ("Var -", session.decrease_variance),
        ("Smooth", session.smooth),
        ("Bright +", lambda: session.brightness(0.8)),
        ("Bright -", lambda: session.brightness(0.2)),
        ("Period X", lambda: session.periodicity(period_x=8)),
        ("Period Y", lambda: session.periodicity(period_y=8)),
        ("Alternatives", lambda: session.random_alternatives(3)),
        ("Undo", session.undo),
        ("Redo", session.redo),
        ("Reset Z", session.reset_region_z),
    ]
    for name, fn in tools:
        act = toolbar.addAction(name)
        act.triggered.connect(lambda _=False, f=fn: (f(), refresh()))
    save_act = toolbar.addAction("Save")

    def do_save():
        path, _ = QtWidgets.QFileDialog.getSaveFileName(win, "Save SR", "sr.png")
        if path:
            session.save_sr(path)

    save_act.triggered.connect(do_save)

    win.setCentralWidget(label)
    refresh()
    win.show()
    app.exec_()


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("-opt", required=True)
    parser.add_argument("--lr", required=True)
    args = parser.parse_args(argv)
    from esr_tpu.explore.cli import build_session_from_opt

    launch(build_session_from_opt(args.opt, args.lr))


if __name__ == "__main__":
    main()

"""Qt GUI wiring smoke test with a fake Qt binding (VERDICT r2 next-step #9).

PyQt5/PySide6 are absent in this image, so ``explore.gui.launch`` had never
executed anywhere. This injects a minimal fake ``PyQt5`` into sys.modules and
drives ``launch`` against a spy view-model, asserting that every toolbar
action, dialog flow, and pointer event maps to the intended
EditorViewModel call — any typo or signature drift in the Qt-only code now
fails a test instead of shipping silently.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest


# -- minimal fake Qt ---------------------------------------------------------


class _Signal:
    def __init__(self):
        self._cbs = []

    def connect(self, cb):
        self._cbs.append(cb)

    def emit(self, *a):
        import inspect

        for cb in self._cbs:
            # PyQt truncates signal args to the slot's arity — emulate so
            # `lambda: ...` slots connected to triggered(bool) work
            try:
                n = len(inspect.signature(cb).parameters)
            except (TypeError, ValueError):
                n = len(a)
            cb(*a[:n])


class _Action:
    def __init__(self, name):
        self.name = name
        self.triggered = _Signal()
        self.toggled = _Signal()
        self._checkable = False

    def setCheckable(self, v):
        self._checkable = bool(v)

    def trigger(self):
        self.triggered.emit(False)


class _ToolBar:
    def __init__(self, name):
        self.name = name
        self.actions: dict[str, _Action] = {}
        self.widgets = []

    def addAction(self, name):
        a = _Action(name)
        self.actions[name] = a
        return a

    def addWidget(self, w):
        self.widgets.append(w)


class _StatusBar:
    def __init__(self):
        self.messages = []
        self.permanent = []

    def showMessage(self, msg):
        self.messages.append(msg)

    def addPermanentWidget(self, w):
        self.permanent.append(w)


class _MainWindow:
    last_instance = None

    def __init__(self):
        _MainWindow.last_instance = self
        self.toolbars: dict[str, _ToolBar] = {}
        self._status = _StatusBar()
        self.central = None
        self.shown = False

    def setWindowTitle(self, t):
        self.title = t

    def statusBar(self):
        return self._status

    def addToolBar(self, name):
        tb = _ToolBar(name)
        self.toolbars[name] = tb
        return tb

    def setCentralWidget(self, w):
        self.central = w

    def show(self):
        self.shown = True


class _Label:
    def __init__(self):
        self.pixmaps = []

    def setScaledContents(self, v):
        pass

    def setPixmap(self, p):
        self.pixmaps.append(p)


class _ComboBox:
    def __init__(self):
        self.items = []
        self.currentTextChanged = _Signal()

    def addItems(self, items):
        self.items += list(items)


class _SpinBox:
    def __init__(self):
        self.valueChanged = _Signal()

    def setRange(self, lo, hi):
        pass

    def setValue(self, v):
        self.value = v


class _ProgressBar:
    def __init__(self):
        self.maximum = None
        self.value = None

    def setMaximumWidth(self, w):
        pass

    def setMaximum(self, m):
        self.maximum = m

    def setValue(self, v):
        self.value = v


class _Application:
    def __init__(self, argv):
        pass

    def processEvents(self):
        pass

    def exec_(self):
        return 0


class _Dialog:
    # class-level toggle: whether modal dialogs report acceptance
    accept_next = True
    Accepted = 1

    def __init__(self, parent=None):
        self._result = None

    def setWindowTitle(self, t):
        pass

    def accept(self):
        self._result = _Dialog.Accepted

    def exec_(self):
        # auto-click the first candidate button if one was registered
        if _Dialog.accept_next and _PushButton.instances:
            _PushButton.instances[0].clicked.emit(False)
        return self._result if self._result is not None else (
            _Dialog.Accepted if _Dialog.accept_next else 0
        )


class _PushButton:
    instances: list["_PushButton"] = []

    def __init__(self):
        self.clicked = _Signal()
        _PushButton.instances.append(self)

    def setIcon(self, i):
        pass

    def setIconSize(self, s):
        pass


class _HBoxLayout:
    def __init__(self, parent=None):
        pass

    def addWidget(self, w):
        pass


class _InputDialog:
    next_text = ("graffiti", True)
    next_double: list[tuple[float, bool]] = []
    next_int: list[tuple[int, bool]] = []

    @staticmethod
    def getText(parent, title, label):
        return _InputDialog.next_text

    @staticmethod
    def getDouble(parent, title, label, default, lo, hi, decimals):
        if _InputDialog.next_double:
            return _InputDialog.next_double.pop(0)
        return (default, True)

    @staticmethod
    def getInt(parent, title, label, default, lo, hi):
        if _InputDialog.next_int:
            return _InputDialog.next_int.pop(0)
        return (default, True)


class _FileDialog:
    next_open = ("", "")
    next_save = ("", "")

    @staticmethod
    def getOpenFileName(parent, title, *a):
        return _FileDialog.next_open

    @staticmethod
    def getSaveFileName(parent, title, *a):
        return _FileDialog.next_save


class _QImage:
    Format_RGB888 = 13

    def __init__(self, data, w, h, stride, fmt):
        self.shape = (h, w)


class _QPixmap:
    @staticmethod
    def fromImage(img):
        return img


class _QIcon:
    def __init__(self, pm=None):
        pass


class _QSize:
    def __init__(self, w, h):
        pass


def _install_fake_qt(monkeypatch):
    qtcore = types.ModuleType("PyQt5.QtCore")
    qtcore.QSize = _QSize
    qtgui = types.ModuleType("PyQt5.QtGui")
    qtgui.QImage = _QImage
    qtgui.QPixmap = _QPixmap
    qtgui.QIcon = _QIcon
    qtwidgets = types.ModuleType("PyQt5.QtWidgets")
    qtwidgets.QApplication = _Application
    qtwidgets.QMainWindow = _MainWindow
    qtwidgets.QLabel = _Label
    qtwidgets.QComboBox = _ComboBox
    qtwidgets.QSpinBox = _SpinBox
    qtwidgets.QProgressBar = _ProgressBar
    qtwidgets.QInputDialog = _InputDialog
    qtwidgets.QFileDialog = _FileDialog
    qtwidgets.QDialog = _Dialog
    qtwidgets.QPushButton = _PushButton
    qtwidgets.QHBoxLayout = _HBoxLayout
    pyqt5 = types.ModuleType("PyQt5")
    pyqt5.QtCore, pyqt5.QtGui, pyqt5.QtWidgets = qtcore, qtgui, qtwidgets
    for name, mod in [
        ("PyQt5", pyqt5),
        ("PyQt5.QtCore", qtcore),
        ("PyQt5.QtGui", qtgui),
        ("PyQt5.QtWidgets", qtwidgets),
    ]:
        monkeypatch.setitem(sys.modules, name, mod)


# -- spy view-model ----------------------------------------------------------


class _SpyVM:
    """Records every tool/selection call; presents the attributes launch()
    reads (render_display, brush_radius, candidates, callbacks)."""

    def __init__(self):
        self.calls: list[tuple] = []
        self.brush_radius = 8
        self.show_zmap = False
        self.candidates = []
        self.on_status = None
        self.on_progress = None

    def render_display(self):
        return np.zeros((16, 16, 3), np.uint8)

    def candidate_image(self, i):
        return np.zeros((8, 8, 3), np.uint8)

    def __getattr__(self, name):
        if name.startswith("_"):
            raise AttributeError(name)

        def record(*a, **kw):
            self.calls.append((name,) + a)
            if name == "generate_alternatives":
                self.candidates = [(None, None)] * 2
            return "ok"

        return record

    def called(self, name):
        return [c for c in self.calls if c[0] == name]


@pytest.fixture()
def gui_env(monkeypatch):
    _PushButton.instances = []
    _Dialog.accept_next = True
    _install_fake_qt(monkeypatch)
    vm = _SpyVM()
    from esr_tpu.explore.gui import launch

    launch(vm)  # exec_ returns immediately; all wiring is now registered
    win = _MainWindow.last_instance
    return vm, win


def test_every_toolbar_action_maps_to_viewmodel(gui_env):
    vm, win = gui_env
    tools = win.toolbars["tools"]
    expected = {
        "Var +": ("variance", 1),
        "Var -": ("variance", -1),
        "Realism +": ("realism", 1),
        "Realism -": ("realism", -1),
        "Smooth": ("smooth",),
        "Brightness": ("brightness", 0.5),
        "Imprint text": ("imprint_text", "graffiti"),
        "Undo": ("undo",),
        "Redo": ("redo",),
        "Reset Z": ("reset_region",),
    }
    for action_name, want in expected.items():
        assert action_name in tools.actions, f"missing toolbar action {action_name}"
        before = len(vm.calls)
        tools.actions[action_name].trigger()
        assert want in vm.calls[before:], (action_name, vm.calls[before:])


def test_periodicity_dialog_flow(gui_env):
    vm, win = gui_env
    _InputDialog.next_double = [(3.0, True), (5.0, True)]
    win.toolbars["tools"].actions["Periodicity"].trigger()
    assert ("periodicity", 3.0, 5.0) in vm.calls


def test_search_strength_dialog_flow(gui_env):
    vm, win = gui_env
    _InputDialog.next_int = [(48, True)]
    _InputDialog.next_double = [(2.5, True)]
    win.toolbars["tools"].actions["Search strength"].trigger()
    assert ("set_search_steps", 48) in vm.calls
    assert ("set_z_range_max", 2.5) in vm.calls


def test_alternatives_dialog_picks_candidate(gui_env):
    vm, win = gui_env
    win.toolbars["tools"].actions["Alternatives"].trigger()
    assert vm.called("generate_alternatives")
    assert ("pick_alternative", 0) in vm.calls


def test_selection_toolbar_and_pointer_events(gui_env):
    vm, win = gui_env
    sel = win.toolbars["selection"]
    sel.actions["Finish polygon"].trigger()
    assert vm.called("finish_polygon")
    sel.actions["Clear"].trigger()
    assert vm.called("clear_selection")
    # combo box drives selection mode
    mode_box = sel.widgets[0]
    mode_box.currentTextChanged.emit("brush")
    assert ("set_selection_mode", "brush") in vm.calls
    # canvas pointer protocol is attached and forwards (y, x)
    canvas = win.central

    class Ev:
        def pos(self):
            class P:
                def x(self):
                    return 4

                def y(self):
                    return 7

            return P()

    canvas.mousePressEvent(Ev())
    canvas.mouseMoveEvent(Ev())
    canvas.mouseReleaseEvent(Ev())
    assert ("pointer_down", 7, 4) in vm.calls
    assert ("pointer_drag", 7, 4) in vm.calls
    assert ("pointer_up", 7, 4) in vm.calls


def test_io_actions_respect_cancelled_dialogs(gui_env):
    vm, win = gui_env
    io_bar = win.toolbars["io"]
    _FileDialog.next_save = ("", "")  # user cancels
    io_bar.actions["Save image"].trigger()
    assert not vm.called("save_image")
    _FileDialog.next_save = ("/tmp/x.png", "png")
    io_bar.actions["Save image"].trigger()
    assert ("save_image", "/tmp/x.png") in vm.calls
    _FileDialog.next_open = ("/tmp/s.npz", "npz")
    io_bar.actions["Load session"].trigger()
    assert ("load_session", "/tmp/s.npz") in vm.calls
    io_bar.actions["Save session"].trigger()
    assert ("save_session", "/tmp/x.png") in vm.calls or vm.called("save_session")


def test_status_and_progress_plumbing(gui_env):
    vm, win = gui_env
    assert vm.on_status is not None and vm.on_progress is not None
    vm.on_status("hello")
    assert "hello" in win._status.messages
    vm.on_progress(3, 8, None)
    bar = win._status.permanent[0]
    assert (bar.value, bar.maximum) == (3, 8)


def test_launch_without_qt_raises_helpful_error(monkeypatch):
    # both bindings absent -> actionable error pointing at the terminal CLI
    import builtins

    real_import = builtins.__import__

    def no_qt(name, *a, **kw):
        if name.startswith(("PyQt5", "PySide6")):
            raise ImportError(name)
        return real_import(name, *a, **kw)

    monkeypatch.setattr(builtins, "__import__", no_qt)
    from esr_tpu.explore.gui import launch

    with pytest.raises(RuntimeError, match="explore.cli"):
        launch(_SpyVM())

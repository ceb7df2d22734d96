package graft.hadoop

import java.io.FileNotFoundException
import java.nio.file.{Files, LinkOption, NoSuchFileException}
import java.nio.file.attribute.{PosixFileAttributes, PosixFilePermission}

import org.apache.hadoop.fs.{FileStatus, LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** Local-mode filesystem without process forks (optimization guide
  * §7.3 "commit-protocol frames at the end of a write" / §1.2 step 2
  * per-task work — here per-FILE work on the DRIVER).
  *
  * This sandbox has no native Hadoop library (`NativeCodeLoader:
  * using builtin-java classes`), so `RawLocalFileSystem` falls back
  * to FORKING A SHELL COMMAND for every permission-bearing metadata
  * op: `getFileStatus`/`listStatus` lazily run `ls -ld` when
  * permissions are read, `getFileLinkStatus` runs `readlink` per
  * file during scan listings, and every created file/dir pays a
  * `chmod` fork (`LocalFSFileOutputStream` ctor → `setPermission`).
  * Thread-dump sampling of a warm `k2_restore` loop measured ~14% of
  * wall time inside `Shell.runCommand`, and /proc/stat counted ~380
  * forks per rep — the snapshot-store fixtures create dozens of
  * small files (batch parquet + manifests + CRCs) per commit, and
  * structured-streaming checkpoints create several per micro-batch
  * per state partition.
  *
  * [[NoForkRawLocalFileSystem]] replaces exactly those call sites
  * with `java.nio.file` equivalents (readAttributes / nio
  * setPosixFilePermissions), which are plain syscalls. Genuine
  * symlinks (absent from every graft layout) still defer to the
  * stock implementation, so semantics are unchanged — only the
  * transport for the same metadata. Installed per session via
  * `spark.hadoop.fs.file.impl`; a cluster deployment reads real
  * storage (HDFS/S3) whose FileSystem impls never shell out, so this
  * shim is local-mode-only by construction and carries zero
  * scale-dependent tuning.
  */
class NoForkRawLocalFileSystem extends RawLocalFileSystem {
  import NoForkRawLocalFileSystem._

  private def nioPath(p: Path): java.nio.file.Path = pathToFile(p).toPath

  private def attrsOf(p: Path, follow: Boolean): PosixFileAttributes =
    try {
      if (follow)
        Files.readAttributes(nioPath(p), classOf[PosixFileAttributes])
      else
        Files.readAttributes(nioPath(p), classOf[PosixFileAttributes],
          LinkOption.NOFOLLOW_LINKS)
    } catch {
      case _: NoSuchFileException =>
        throw new FileNotFoundException(s"File $p does not exist")
    }

  private def toStatus(p: Path, a: PosixFileAttributes): FileStatus =
    new FileStatus(a.size(), a.isDirectory, 1, getDefaultBlockSize(p),
      a.lastModifiedTime().toMillis, a.lastAccessTime().toMillis,
      new FsPermission(modeOf(a.permissions())),
      a.owner().getName, a.group().getName, null,
      p.makeQualified(getUri, getWorkingDirectory))

  override def getFileStatus(f: Path): FileStatus =
    toStatus(f, attrsOf(f, follow = true))

  override def getFileLinkStatus(f: Path): FileStatus = {
    val a = attrsOf(f, follow = false)
    if (a.isSymbolicLink) super.getFileLinkStatus(f) // rare: honest fallback
    else toStatus(f, a)
  }

  override def listStatus(f: Path): Array[FileStatus] = {
    val localf = pathToFile(f)
    if (localf.isFile) return Array(getFileStatus(f))
    val names = localf.list()
    if (names == null)
      throw new FileNotFoundException(s"File $f does not exist")
    // a child deleted between list() and stat is skipped, matching the
    // stock implementation's FileNotFoundException swallow
    names.flatMap { n =>
      try Some(getFileStatus(new Path(f, n)))
      catch { case _: FileNotFoundException => None }
    }
  }

  override def setPermission(p: Path, permission: FsPermission): Unit =
    try Files.setPosixFilePermissions(nioPath(p), posixOf(permission.toShort))
    catch {
      case _: NoSuchFileException =>
        throw new FileNotFoundException(s"File $p does not exist")
      case _: UnsupportedOperationException =>
        super.setPermission(p, permission) // non-POSIX store: stock path
    }
}

object NoForkRawLocalFileSystem {
  import PosixFilePermission._
  private val bitPerm: Seq[(Int, PosixFilePermission)] = Seq(
    0x100 -> OWNER_READ, 0x80 -> OWNER_WRITE, 0x40 -> OWNER_EXECUTE,
    0x20 -> GROUP_READ, 0x10 -> GROUP_WRITE, 0x8 -> GROUP_EXECUTE,
    0x4 -> OTHERS_READ, 0x2 -> OTHERS_WRITE, 0x1 -> OTHERS_EXECUTE)

  def posixOf(mode: Short): java.util.Set[PosixFilePermission] = {
    val s = java.util.EnumSet.noneOf(classOf[PosixFilePermission])
    bitPerm.foreach { case (bit, p) => if ((mode & bit) != 0) s.add(p) }
    s
  }

  def modeOf(perms: java.util.Set[PosixFilePermission]): Short =
    bitPerm.foldLeft(0) { case (m, (bit, p)) =>
      if (perms.contains(p)) m | bit else m
    }.toShort
}

/** The `file:` scheme FileSystem the graft sessions install
  * (`spark.hadoop.fs.file.impl`): stock [[LocalFileSystem]] checksum
  * semantics over the fork-free raw layer. Subclassing keeps
  * `FileSystem.getLocal`'s `LocalFileSystem` cast valid.
  */
class FastLocalFileSystem
  extends LocalFileSystem(new NoForkRawLocalFileSystem)

/** The FileContext axis of the same fix
  * (`spark.hadoop.fs.AbstractFileSystem.file.impl`): FileContext
  * resolves `file:` through `fs.local.LocalFs`, which wraps its OWN
  * stock RawLocalFileSystem — `fs.file.impl` never reaches it, so the
  * snapshot store's atomic CURRENT swap (FileContext rename OVERWRITE,
  * `SnapshotStore.scala`) and structured streaming's checkpoint
  * manager still paid a forked `readlink` per rename precondition
  * check (`AbstractFileSystem.renameInternal` → `getFileLinkStatus`).
  * Same checksum semantics as stock LocalFs, fork-free raw below.
  */
class NoForkRawLocalFs(uri: java.net.URI,
    conf: org.apache.hadoop.conf.Configuration)
  extends org.apache.hadoop.fs.DelegateToFileSystem(
    uri, new NoForkRawLocalFileSystem, conf, "file", false) {
  override def getUriDefaultPort: Int = -1 // mirrors fs.local.RawLocalFs
  override def isValidName(src: String): Boolean = true // local paths
}

class FastLocalFs(uri: java.net.URI,
    conf: org.apache.hadoop.conf.Configuration)
  extends org.apache.hadoop.fs.ChecksumFs(new NoForkRawLocalFs(uri, conf))

package graft.dsv2

import graft.core.Json
import org.apache.hadoop.fs.{FileSystem, Path}

import java.nio.charset.StandardCharsets

/**
 * File-based privilege system (capability of paimon's
 * FileBasedPrivilegeManager + PrivilegedCatalog,
 * docs/docs/maintenance/manage-privileges.mdx): users, salted password
 * hashes and grants persisted at `<warehouse>/privilege/manifest.json`.
 * Until `init_file_based_privilege` runs, access is unrestricted; once the
 * manifest exists every [[GraftCatalog]] op authenticates with the `user` /
 * `password` catalog options and checks the required privilege. Scopes
 * nest: a grant on `*` covers every database, on `db` every table in it,
 * on `db.table` one table. `root` holds every privilege and cannot be
 * dropped; ADMIN lets a user manage users/grants.
 */
object GraftPrivileges {

  // privilege names follow the reference's set
  val All: Set[String] = Set("SELECT", "INSERT", "ALTER_TABLE", "DROP_TABLE",
    "CREATE_TABLE", "CREATE_DATABASE", "DROP_DATABASE", "ADMIN")

  case class Grant(privilege: String, scope: String)
  case class User(passwordSha: String, grants: Seq[Grant] = Nil)
  case class Manifest(users: Map[String, User])

  def sha(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes(StandardCharsets.UTF_8)).map("%02x".format(_)).mkString

  private def manifestPath(warehouse: String) =
    new Path(warehouse, "privilege/manifest.json")

  def enabled(fs: FileSystem, warehouse: String): Boolean =
    fs.exists(manifestPath(warehouse))

  def load(fs: FileSystem, warehouse: String): Option[Manifest] = {
    val p = manifestPath(warehouse)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    try {
      val bytes = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, bytes, 4096, false)
      Some(Json.read(bytes.toString("UTF-8"), classOf[Manifest]))
    } finally in.close()
  }

  def save(fs: FileSystem, warehouse: String, m: Manifest): Unit = {
    val p = manifestPath(warehouse)
    fs.mkdirs(p.getParent)
    val out = fs.create(p, true)
    try out.write(Json.write(m).getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  def init(fs: FileSystem, warehouse: String, rootPassword: String): Unit = {
    require(!enabled(fs, warehouse), "privilege system already initialized")
    save(fs, warehouse, Manifest(Map("root" -> User(sha(rootPassword)))))
  }

  /** Authenticated user name, or None when the system is not initialized.
    * Wrong or missing credentials throw. */
  def authenticate(fs: FileSystem, warehouse: String,
                   user: Option[String], password: Option[String]): Option[String] =
    load(fs, warehouse).map { m =>
      val u = user.getOrElse(
        throw new SecurityException("privileges enabled: set the 'user' catalog option"))
      val rec = m.users.getOrElse(u,
        throw new SecurityException(s"unknown user $u"))
      if (!password.map(sha).contains(rec.passwordSha))
        throw new SecurityException(s"wrong password for $u")
      u
    }

  /** `scope` of the op: (db, table) — table/db may be empty for broader ops. */
  def check(m: Manifest, user: String, privilege: String,
            db: String, table: String): Boolean = {
    if (user == "root") return true
    m.users.get(user).exists(_.grants.exists { g =>
      (g.privilege == privilege || g.privilege == "ADMIN") &&
        (g.scope == "*" || g.scope == db ||
          (table.nonEmpty && g.scope == s"$db.$table"))
    })
  }

  def createUser(fs: FileSystem, wh: String, name: String, password: String): Unit =
    update(fs, wh) { m =>
      require(!m.users.contains(name), s"user $name exists")
      Manifest(m.users + (name -> User(sha(password))))
    }

  def dropUser(fs: FileSystem, wh: String, name: String): Unit =
    update(fs, wh) { m =>
      require(name != "root", "cannot drop root")
      Manifest(m.users - name)
    }

  def grant(fs: FileSystem, wh: String, name: String,
            privilege: String, scope: String): Unit =
    update(fs, wh) { m =>
      require(All.contains(privilege), s"unknown privilege $privilege")
      val u = m.users.getOrElse(name, throw new IllegalArgumentException(s"no user $name"))
      Manifest(m.users + (name -> u.copy(grants =
        (u.grants :+ Grant(privilege, scope)).distinct)))
    }

  def revoke(fs: FileSystem, wh: String, name: String,
             privilege: String, scope: String): Unit =
    update(fs, wh) { m =>
      val u = m.users.getOrElse(name, throw new IllegalArgumentException(s"no user $name"))
      Manifest(m.users + (name -> u.copy(grants =
        u.grants.filterNot(g => g.privilege == privilege && g.scope == scope))))
    }

  private def update(fs: FileSystem, wh: String)(f: Manifest => Manifest): Unit = {
    val m = load(fs, wh).getOrElse(
      throw new IllegalStateException("privilege system not initialized"))
    save(fs, wh, f(m))
  }
}
